package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.vector.VectorKernels

class EmbeddingDedupSpec extends AnyFunSuite with SparkSpec {

  /** Small corpus with planted structure: 1≈2 (near-identical), 3 is a
    * scaled copy of 1 (cosine 1.0 exactly — scale-invariant), 4 and 5
    * point elsewhere.
    */
  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.2f, 0.1f)),
      (2L, Array(0.98f, 0.05f, 0.21f, 0.1f)),
      (3L, Array(2.0f, 0.0f, 0.4f, 0.2f)),
      (4L, Array(-1.0f, 0.5f, 0.0f, 0.0f)),
      (5L, Array(0.0f, -1.0f, 0.3f, -0.5f))
    ).toDF("id", "embedding")
  }

  test("cosinePairs finds planted near-dups and nothing else at 0.95") {
    val out = EmbeddingDedup.cosinePairs(vecs, col("id"), col("embedding"), 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("scaled copy scores cosine exactly 1.0") {
    val c = EmbeddingDedup.cosinePairs(vecs, col("id"), col("embedding"), 0.95)
      .where(col("id_a") === 1L && col("id_b") === 3L)
      .collect().head.getAs[Double]("cosine")
    assert(c == 1.0)
  }

  test("blocked route equals the broadcast exact tier, at any block count") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine"))).toSet
    val exact = rows(EmbeddingDedup.cosinePairs(vecs, col("id"), col("embedding"), 0.5))
    for (b <- Seq(1, 3, 8)) {
      val blocked = rows(EmbeddingDedup.cosinePairsBlocked(
        vecs, col("id"), col("embedding"), 0.5, numBlocks = b))
      assert(blocked == exact, s"numBlocks=$b diverged")
    }
  }

  test("auto dispatch picks a route by size with identical results") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine"))).toSet
    val exact = rows(EmbeddingDedup.cosinePairs(vecs, col("id"), col("embedding"), 0.5))
    // 5 rows under a 100-row budget → broadcast tier
    val small = rows(EmbeddingDedup.cosinePairsAuto(
      vecs, col("id"), col("embedding"), 0.5, maxBroadcastRows = 100L))
    // 1-row budget forces the tiled tier on the same data
    val large = rows(EmbeddingDedup.cosinePairsAuto(
      vecs, col("id"), col("embedding"), 0.5, maxBroadcastRows = 1L))
    assert(small == exact && large == exact)
  }

  test("LSH pairs are a subset of exact pairs with near-dup recall") {
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet(EmbeddingDedup.cosinePairs(vecs, col("id"), col("embedding"), 0.95))
    val lsh = pairSet(EmbeddingDedup.cosineLshPairs(vecs, col("id"), col("embedding"),
      0.95, dim = 4))
    assert(lsh.subsetOf(exact))
    // at cosine ≥ 0.95 per-band collision ≈ 0.86^4 ≈ 0.55; missing all
    // 16 bands has probability ~3e-6 — planted dups must be caught
    assert(lsh == exact)
  }

  test("LSH recall vs brute force on the sf0.001 fixture is high") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exact = pairSet(EmbeddingDedup.cosinePairs(emb, col("vec_id"), col("embedding"), 0.35))
    val lsh = pairSet(EmbeddingDedup.cosineLshPairs(emb, col("vec_id"), col("embedding"),
      0.35, dim = 64))
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    // 0.35 is far below the LSH design point (near-dup thresholds);
    // geometry note in EmbeddingDedup predicts ~0.91 here
    assert(recall >= 0.80, s"recall $recall (lsh=${lsh.size}, exact=${exact.size})")
  }

  test("hyperplane band keys: codegen and interpreted paths agree; deterministic") {
    val planes = EmbeddingDedup.hyperplanes(4, bands = 8, bits = 3, seed = 7L)
    val expr = (c: org.apache.spark.sql.Column) =>
      VectorKernels.hyperplaneBandKeys(c, planes, 4, 8, 3)
    val viaDf = vecs.select(col("id"), expr(col("embedding")).as("keys"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    // interpreted twin via direct eval
    val rows = vecs.orderBy("id").collect()
    val interp = rows.map { r =>
      val arr = r.getSeq[Float](1).toArray
      val k = VectorKernels.HyperplaneBandKeys(
        org.apache.spark.sql.catalyst.expressions.Literal.create(arr,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)),
        planes, 4, 8, 3)
      k.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    assert(viaDf.map(_.toSeq).toSeq == interp.map(_.toSeq).toSeq)
    // band index occupies the high bits: keys from different bands are distinct
    viaDf.foreach(keys => assert(keys.distinct.size == keys.size))
  }
}
