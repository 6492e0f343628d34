package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Sign-bit packing layout, Hamming distances, and the IVF index
  * save/load lifecycle.
  */
class BinaryQuantSpec extends AnyFunSuite with SparkSpec {

  private def packOne(v: Seq[Float]): Seq[Long] = {
    import spark.implicits._
    Seq(Tuple1(v.toArray)).toDF("emb")
      .select(Quantize.binary(col("emb")).as("w"))
      .collect().head.getSeq[Long](0).toSeq
  }

  test("packs MSB-first, 32 bits per word") {
    // bits: +,-,+ → positions 1 and 3 → 2^31 + 2^29
    assert(packOne(Seq(1.0f, -1.0f, 0.5f)) == Seq((1L << 31) + (1L << 29)))
    // zero is NOT positive
    assert(packOne(Seq(0.0f, 2.0f)) == Seq(1L << 30))
    // 33 dims spill into a second word; a positive dim 33 is its MSB
    val long33 = Seq.fill(32)(-1.0f) :+ 1.0f
    assert(packOne(long33) == Seq(0L, 1L << 31))
  }

  test("hamming counts exactly the flipped sign bits") {
    import spark.implicits._
    val df = Seq((
      Array(1.0f, -1.0f, 1.0f, 1.0f),
      Array(1.0f, 1.0f, 1.0f, -1.0f))).toDF("a", "b")
    val d = df.select(Quantize.hamming(Quantize.binary(col("a")),
      Quantize.binary(col("b"))).as("d")).collect().head.getLong(0)
    assert(d == 2)
    val zero = df.select(Quantize.hamming(Quantize.binary(col("a")),
      Quantize.binary(col("a"))).as("d")).collect().head.getLong(0)
    assert(zero == 0)
  }

  test("ivf index survives a save/load round trip") {
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val built = Ann.buildIvf(corpus, nlist = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Ann.saveIvf(built, dir)
    val loaded = Ann.loadIvf(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq == built.centroids.map(_.toSeq).toSeq)
    def assignments(i: Ann.IvfIndex): Seq[(Long, Int)] =
      i.assigned.select(col("vec_id"), col("cluster_id")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(assignments(loaded) == assignments(built))
    // a full-probe search through the loaded index is exact — the
    // serving-side guarantee the persistence must not break
    val q = corpus.where(col("vec_id") === 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val viaLoaded = Ann.ivfKnnJoin(q, loaded, k = 5, nprobe = 4)
      .select("left_id", "right_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val viaBuilt = Ann.ivfKnnJoin(q, built, k = 5, nprobe = 4)
      .select("left_id", "right_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(viaLoaded.sortBy(_._4) == viaBuilt.sortBy(_._4))
  }
}
