package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** IVF probe search vs the exact brute-force baseline on the harness
  * embeddings fixture.
  */
class AnnSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = Tables.embeddings(spark, dir)

  private def queryVec: Seq[Float] =
    corpus.where(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0)

  private def bruteIds(k: Int): Seq[Long] = {
    val q = spark.createDataFrame(Seq(Tuple1(queryVec))).toDF("q_emb")
    Ann.l2TopK(corpus, q, col("embedding"), col("vec_id"), k)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
  }

  test("probing all clusters reproduces the exact result") {
    val idx = Ann.buildIvf(corpus, nlist = 8)
    val ids = idx.searchL2(queryVec, k = 10, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids == bruteIds(10))
  }

  test("partial probing keeps high recall at a fraction of the scan") {
    val idx = Ann.buildIvf(corpus, nlist = 8)
    val approx = idx.searchL2(queryVec, k = 10, nprobe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = bruteIds(10).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("ivfKnnJoin at full probe equals the brute-force similarity join") {
    val emb = corpus.select(col("vec_id").as("id"), col("embedding"))
    val idx = Ann.buildIvf(corpus, nlist = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val full = rows(Ann.ivfKnnJoin(emb.where(col("id") < 15), idx,
      k = 4, nprobe = 8))
    val brute = rows(Knn.similarityJoin(emb.where(col("id") < 15), emb, k = 4))
    assert(full == brute)
  }

  test("ivfKnnJoin partial probe: per-query candidates come only from probed clusters") {
    val emb = corpus.select(col("vec_id").as("id"), col("embedding"))
    val idx = Ann.buildIvf(corpus, nlist = 8)
    val partial = Ann.ivfKnnJoin(emb.where(col("id") < 15), idx,
      k = 4, nprobe = 3)
    // every reported neighbor must live in one of its query's 3 probes
    val probeMap = emb.where(col("id") < 15)
      .select(col("id"), VectorKernels.nearestCentroids(col("embedding"),
        idx.centroids, 3).as("probes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    val clusterOf = idx.assigned.select(col("vec_id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    partial.collect().foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(probeMap(q).contains(clusterOf(n)),
        s"neighbor $n of query $q came from an unprobed cluster")
    }
  }

  test("an all-NaN query yields an empty probe list, not phantom cluster-0 probes") {
    import spark.implicits._
    val idx = Ann.buildIvf(corpus, nlist = 4)
    val probes = Seq(Tuple1(Seq(Float.NaN, Float.NaN)))
      .toDF("embedding")
      .select(VectorKernels.nearestCentroids(col("embedding"),
        idx.centroids, 2).as("p"))
      .head.getSeq[Int](0)
    assert(probes.isEmpty, s"NaN query produced probes $probes")
    // and a normal query still gets exactly nprobe distinct probes
    val ok = corpus.limit(1)
      .select(VectorKernels.nearestCentroids(col("embedding"),
        idx.centroids, 2).as("p"))
      .head.getSeq[Int](0)
    assert(ok.size == 2 && ok.distinct.size == 2, s"got $ok")
  }

  test("cluster_id write partitioning makes IVF probes partition-prunable") {
    val idx = Ann.buildIvf(corpus, nlist = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    idx.assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(dir)
    val probed = spark.read.parquet(dir)
      .where(org.apache.spark.sql.functions.col("cluster_id").isin(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"),
      s"no partition pruning in plan:\n$plan")
    assert(probed.count() > 0)
  }

  test("cosine top-k self-match: the query vector ranks itself first") {
    val q = spark.createDataFrame(Seq(Tuple1(queryVec))).toDF("q_emb")
    val top = Ann.cosineTopK(corpus, q, col("embedding"), col("vec_id"), 3)
      .select("vec_id", "sim").collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getDouble(1) == 1.0)
  }
}
