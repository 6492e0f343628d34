package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.EmbeddingDedup

/** Streaming self embedding-dedup: prefix-causal keep-earliest
  * verdicts equal the batch cosine-LSH operator's pairs regardless of
  * batch boundaries (same hyperplanes ⇒ same band collisions, so the
  * equality holds for ANY recall geometry); threshold and keep-first
  * behavior; kill-and-resume over compacted registries + rebuilt
  * bucket screen.
  */
class StreamingEmbDedupSpec extends AnyFunSuite with SparkSpec {

  private val Dim = 8

  private def tmp(tag: String): String = graft.TempDirs.create(tag).toString

  private def runStream(rows: Seq[(Long, Seq[Float])], nChunks: Int,
                        registryDir: String, minCosine: Double,
                        ckpt: Option[String] = None,
                        registerDups: Boolean = true):
      Seq[(Long, Option[Long], Option[Double])] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float])]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[Long], Option[Double])]()
    // SAME banding geometry as batchExpected's operator (16x4, the
    // batch defaults): the stream-equals-batch-op assertion relies on
    // identical planes => identical band collisions (the stream's OWN
    // default is the 8x16 near-dup operating point)
    val q = StreamingEmbDedup.embDedupStream(
      ms.toDS().toDF("id", "embedding"), col("id"), col("embedding"),
      registryDir, ckpt, buckets = 4, dim = Dim,
      bands = EmbeddingDedup.NumBands, bits = EmbeddingDedup.BitsPerBand,
      minCosine = minCosine, registerDups = registerDups) { df =>
      df.collect().foreach(r => got.add((r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
    }
    try {
      rows.grouped(math.max(1, (rows.length + nChunks - 1) / nChunks))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq.sortBy(_._1)
  }

  /** The batch LSH operator's keep-earliest reduction. */
  private def batchExpected(rows: Seq[(Long, Seq[Float])],
                            minCosine: Double): Map[Long, (Long, Double)] = {
    import spark.implicits._
    EmbeddingDedup.cosineLshPairs(rows.toDF("id", "embedding"),
        col("id"), col("embedding"), minCosine = minCosine, dim = Dim)
      .groupBy("id_b").agg(min(struct(col("id_a"), col("cosine"))).as("m"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1)))
      .toMap
  }

  /** Orbit {1, 5, 7} colinear (cosine exactly 1); 3 is a true near of
    * 1 (cosine ≈ 0.9285 — above 0.9, below 0.95); 9 is colinear with
    * 3; even ids are pairwise-orthogonal one-hots (cosine 0).
    */
  private def corpus: Seq[(Long, Seq[Float])] = {
    def scale(v: Seq[Float], k: Float) = v.map(_ * k)
    val v1 = Seq(3f, 4f, 0f, 0f, 0f, 0f, 0f, 0f)
    val v3 = Seq(3f, 4f, 2f, 0f, 0f, 0f, 0f, 0f)
    def oneHot(k: Int) = Seq.tabulate(Dim)(i => if (i == k) 1f else 0f)
    Seq(
      1L -> v1,
      2L -> oneHot(0).map(_ * 2f),
      3L -> v3,
      4L -> oneHot(1),
      5L -> scale(v1, 2f),
      6L -> oneHot(2),
      7L -> scale(v1, 3f),
      8L -> oneHot(3),
      9L -> scale(v3, 2f),
      10L -> oneHot(4))
  }

  test("stream verdicts equal the batch LSH operator's keep-earliest pairs, any batching") {
    val expected = batchExpected(corpus, minCosine = 0.9)
    assert(expected.nonEmpty && expected.values.exists(_._2 < 1.0),
      s"fixture must plant colinear AND near pairs: $expected")
    for (chunks <- Seq(1, 3)) {
      val got = runStream(corpus, chunks, tmp(s"ed-eq-$chunks") + "/reg",
        minCosine = 0.9)
      assert(got.map(_._1) == corpus.map(_._1).sorted)
      got.foreach { case (id, dupOf, c) =>
        expected.get(id) match {
          case Some((eDup, eC)) =>
            assert(dupOf.contains(eDup) && c.contains(eC),
              s"id=$id: got ($dupOf, $c), want ($eDup, $eC) [chunks=$chunks]")
          case None =>
            assert(dupOf.isEmpty && c.isEmpty,
              s"id=$id admitted by batch op but flagged ($dupOf) [chunks=$chunks]")
        }
      }
    }
  }

  test("below-threshold near pairs are admitted at a high threshold") {
    val got = runStream(corpus, 3, tmp("ed-thresh") + "/reg", minCosine = 0.95)
    val flagged = got.filter(_._2.isDefined)
    // only the colinear copies (cosine = 1.0) survive 0.95
    assert(flagged.map(r => (r._1, r._2.get)) ==
      Seq((5L, 1L), (7L, 1L), (9L, 3L)), flagged.toString)
    assert(flagged.forall(_._3.contains(1.0)), flagged.toString)
  }

  test("keep-first registration: registry grows with admitted vectors only") {
    val reg = tmp("ed-keepfirst") + "/reg"
    val got = runStream(corpus, 3, reg, minCosine = 0.95,
      registerDups = false)
    assert(got.filter(_._2.isDefined).map(r => (r._1, r._2.get)) ==
      Seq((5L, 1L), (7L, 1L), (9L, 3L)), got.toString)
    spark.catalog.refreshTable(StreamingEmbDedup.vecsTableName(reg))
    spark.catalog.refreshTable(StreamingEmbDedup.bandsTableName(reg))
    assert(spark.table(StreamingEmbDedup.vecsTableName(reg)).count() == 7L)
    assert(spark.table(StreamingEmbDedup.bandsTableName(reg))
      .select("id").distinct().count() == 7L)
  }

  test("kill-and-resume over compacted registries + rebuilt bucket screen stays exact") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmp("ed-resume")
    val reg = base + "/reg"
    val ckpt = base + "/ckpt"
    MaintainedScreen.events.clear()
    val ms = MemoryStream[(Long, Seq[Float])]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[Long], Option[Double])]()
    def start() = StreamingEmbDedup.embDedupStream(
      ms.toDS().toDF("id", "embedding"), col("id"), col("embedding"),
      reg, Some(ckpt), buckets = 4, dim = Dim,
      minCosine = 0.95) { df =>  // stream default geometry (8x16):
      // colinear pairs collide under any geometry, which is all the
      // 0.95 threshold admits
      df.collect().foreach(r => got.add((r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
    }
    val q1 = start()
    try {
      ms.addData(corpus.take(4)); q1.processAllAvailable()
      ms.addData(corpus.slice(4, 7)); q1.processAllAvailable()
    } finally q1.stop()
    // maintenance window + the honest fresh-process simulation
    StreamingEmbDedup.compact(spark, reg, 4, rebuildScreen = true)
    spark.sql(s"DROP TABLE IF EXISTS ${StreamingEmbDedup.bandsTableName(reg)}")
    spark.sql(s"DROP TABLE IF EXISTS ${StreamingEmbDedup.vecsTableName(reg)}")
    val q2 = start()
    try {
      ms.addData(corpus.drop(7)); q2.processAllAvailable()
    } finally q2.stop()
    import scala.jdk.CollectionConverters._
    val out = got.asScala.toSeq.sortBy(_._1)
    // vector 9 (colinear with 3, which q1 registered) must be caught
    // by q2's FIRST batch purely through the BUCKET blooms (the tail
    // bloom is empty right after the rebuild)
    assert(out.collect { case (9L, d, c) => (d, c) } ==
      Seq((Some(3L), Some(1.0))), out.toString)
    assert(out.collect { case (7L, d, _) => d } == Seq(Some(1L)), out.toString)
    assert(out.count(_._2.isEmpty) == 7, out.toString)
    val events = MaintainedScreen.events.asScala.toSeq
    assert(events.exists(e => e.startsWith("emb-dedup") &&
      e.contains("bucket screen covered=")), events.toString)
  }
}
