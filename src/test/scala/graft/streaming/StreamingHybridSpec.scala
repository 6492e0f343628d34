package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.text.TextAnalysis
import graft.vector.Knn

class StreamingHybridSpec extends AnyFunSuite with SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("streamed hybrid RRF equals the batch fusion of both routes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (10L, "hash join hash", Seq(1.0f, 0.0f)),
      (11L, "sort merge join", Seq(0.0f, 1.0f)),
      (12L, "hash vector scan", Seq(0.9f, 0.4f)),
      (13L, "scan scan window", Seq(0.2f, 0.9f)))
      .toDF("doc_id", "text", "embedding")
    val corpus = docs.select(col("doc_id").as("id"), col("embedding"))
    val toks = split(lower(trim(col("text"))), "\\s+")
    val postings = docs.select(col("doc_id").as("id"),
        size(toks).cast("long").as("dl"), explode(toks).as("token"))
      .groupBy("id", "dl", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfs = postings.groupBy("token").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val stats = docs.agg(count(lit(1)).as("n"),
      avg(size(toks).cast("long")).as("avgdl")).localCheckpoint()

    val queryRows = Seq(
      (1L, Seq(0.95f, 0.1f), Seq("hash", "join")),
      (2L, Seq(0.1f, 1.0f), Seq("scan")))

    // batch reference: full per-route rankings, fused by hand
    val vecRank = Knn.similarityJoin(
        queryRows.map { case (id, e, _) => (id, e) }.toDF("id", "embedding"),
        corpus, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong)
      .toMap
    val lexRank = TextAnalysis.bm25Join(docs, col("doc_id"), col("text"),
        queryRows.map { case (id, _, t) => (id, t) }.toDF("query_id", "terms"),
        k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong)
      .toMap
    val expected = queryRows.map(_._1).flatMap { q =>
      val docsAll = (10L to 13L).filter(d =>
        vecRank.contains((q, d)) || lexRank.contains((q, d)))
      docsAll.map { d =>
        val s = vecRank.get((q, d)).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          lexRank.get((q, d)).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (q, d, r4(s))
      }.sortBy { case (_, d, s) => (-s, d) }.take(3)
        .zipWithIndex.map { case ((qq, d, s), i) => (qq, d, s, i + 1) }
    }.toSet

    val ms = MemoryStream[(Long, Seq[Float], Seq[String], Timestamp)]
    val out = StreamingHybrid.rrfPerQuery(
      ms.toDS().toDF("query_id", "q_emb", "terms", "ts"),
      corpus, postings, dfs, stats, k = 3,
      windowDuration = "1 minute", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("hybridstream")
      .outputMode("append").start()
    try {
      ms.addData(queryRows.map { case (id, e, t) => (id, e, t, ts(0)) }: _*)
      q.processAllAvailable()
      ms.addData((99L, Seq(0.0f, 0.0f), Seq("hash"), ts(30)))
      q.processAllAvailable()
      val got = spark.table("hybridstream")
        .where(col("query_id") < 99)
        .select("query_id", "doc_id", "rrf", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(got == expected, s"stream $got != batch $expected")
    } finally q.stop()
  }
}
