package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.vector.Knn

class StreamingSearchSpec extends AnyFunSuite with SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val corpusRows = Seq(
    (10L, Seq(1.0f, 0.0f, 0.0f)),
    (11L, Seq(0.0f, 1.0f, 0.0f)),
    (12L, Seq(0.0f, 0.0f, 1.0f)),
    (13L, Seq(0.7f, 0.7f, 0.0f)))

  test("streamed queries get the same top-k as the batch similarity join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = corpusRows.toDF("id", "embedding")
    val ms = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingSearch.knnPerQuery(
      ms.toDS().toDF("query_id", "q_emb", "ts"), corpus, k = 2,
      windowDuration = "1 minute", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("ssearch")
      .outputMode("append").start()
    try {
      ms.addData(
        (1L, Seq(0.9f, 0.1f, 0.0f), ts(0)),
        (2L, Seq(0.0f, 0.1f, 0.9f), ts(0)))
      q.processAllAvailable()
      // advance the watermark far enough to close the ts(0) window
      ms.addData((99L, Seq(0.0f, 0.0f, 0.0f), ts(30)))
      q.processAllAvailable()
      val got = spark.table("ssearch")
        .select("query_id", "corpus_id", "score", "rank")
        .where(col("query_id") < 99)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val expected = Knn.similarityJoin(
          Seq((1L, Seq(0.9f, 0.1f, 0.0f)), (2L, Seq(0.0f, 0.1f, 0.9f)))
            .toDF("id", "embedding"),
          corpus, k = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(got == expected, s"stream $got != batch $expected")
    } finally q.stop()
  }

  test("IVF-routed streaming search equals the batch ivfKnnJoin at the same probes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = (0L until 40L).map { i =>
      (i, Seq(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat,
        (i % 5).toFloat / 5f))
    }.toDF("vec_id", "embedding")
    val idx = graft.vector.Ann.buildIvf(corpus, nlist = 4)
    val queries = Seq(
      (1L, Seq(1.0f, 0.0f, 0.2f)),
      (2L, Seq(-0.8f, 0.5f, 0.6f)))
    val ms = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingSearch.ivfKnnPerQuery(
      ms.toDS().toDF("query_id", "q_emb", "ts"), idx, k = 3, nprobe = 2,
      windowDuration = "1 minute", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("ivfsearch")
      .outputMode("append").start()
    try {
      ms.addData(queries.map { case (id, e) => (id, e, ts(0)) }: _*)
      q.processAllAvailable()
      ms.addData((99L, Seq(0.0f, 0.0f, 0.0f), ts(30)))
      q.processAllAvailable()
      val got = spark.table("ivfsearch")
        .where(col("query_id") < 99)
        .select("query_id", "corpus_id", "score", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val expected = graft.vector.Ann.ivfKnnJoin(
          queries.toDF("id", "embedding"), idx, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(got == expected, s"stream $got != batch $expected")
    } finally q.stop()
  }

  test("a query recurring within its window merges into one ranking") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = corpusRows.toDF("id", "embedding")
    val ms = MemoryStream[(Long, Seq[Float], Timestamp)]
    val out = StreamingSearch.knnPerQuery(
      ms.toDS().toDF("query_id", "q_emb", "ts"), corpus, k = 3,
      windowDuration = "10 minutes", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("ssearch2")
      .outputMode("append").start()
    try {
      // same query id lands twice in one window (two micro-batches):
      // state must merge, emitting a single 3-row ranking at close
      ms.addData((5L, Seq(1.0f, 0.0f, 0.0f), ts(0)))
      q.processAllAvailable()
      ms.addData((5L, Seq(1.0f, 0.0f, 0.0f), ts(1)))
      q.processAllAvailable()
      ms.addData((99L, Seq(0.0f, 0.0f, 0.0f), ts(60)))
      q.processAllAvailable()
      val rows = spark.table("ssearch2").where(col("query_id") === 5)
        .select("corpus_id", "rank").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2).toSeq
      assert(rows.map(_._2) == Seq(1, 2, 3),
        s"expected one merged ranking, got $rows")
      // the duplicated arrivals must NOT place the same doc at two ranks
      assert(rows.map(_._1).distinct.size == 3,
        s"duplicate docs across ranks: $rows")
    } finally q.stop()
  }
}
