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

  test("IVF-routed hybrid at full probe equals the broadcast route") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (0 until 40).map { i =>
      val words = Seq("hash", "join", "scan", "sort", "merge", "vector")
      val text = (0 until 5).map(j => words((i + j) % words.length)).mkString(" ")
      (100L + i, text, Seq((i % 7).toFloat, (i % 5).toFloat, (i % 3).toFloat))
    }.toDF("doc_id", "text", "embedding")
    val corpus = docs.select(col("doc_id").as("vec_id"), col("embedding"))
    val index = graft.vector.Ann.buildIvf(corpus, nlist = 4)
    index.assigned.localCheckpoint()
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
      (1L, Seq(3.0f, 2.0f, 1.0f), Seq("hash", "merge")),
      (2L, Seq(6.0f, 0.5f, 2.0f), Seq("vector")))

    def run(name: String)(mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] = {
      val ms = MemoryStream[(Long, Seq[Float], Seq[String], Timestamp)]
      val out = mk(ms.toDS().toDF("query_id", "q_emb", "terms", "ts"))
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        ms.addData(queryRows.map { case (id, e, t) => (id, e, t, ts(0)) }: _*)
        q.processAllAvailable()
        ms.addData((99L, Seq(0.0f, 0.0f, 0.0f), Seq("hash"), ts(30)))
        q.processAllAvailable()
        spark.table(name).where(col("query_id") < 99)
          .select("query_id", "doc_id", "rrf", "rank")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getInt(3))).toSet
      } finally q.stop()
    }

    val viaBroadcast = run("hybridbc")(qdf => StreamingHybrid.rrfPerQuery(
      qdf, corpus.select(col("vec_id").as("id"), col("embedding")),
      postings, dfs, stats, k = 5,
      windowDuration = "1 minute", watermarkDelay = "1 minute"))
    val viaIvfFull = run("hybridivf")(qdf => StreamingHybrid.rrfPerQueryIvf(
      qdf, index, postings, dfs, stats, k = 5, nprobe = 4,
      windowDuration = "1 minute", watermarkDelay = "1 minute"))
    assert(viaIvfFull == viaBroadcast,
      s"ivf full-probe $viaIvfFull != broadcast $viaBroadcast")

    // partial probe still emits k ranked rows per query (the lexical
    // route is unaffected; the vector route shrinks to probed clusters)
    val viaIvfPartial = run("hybridivf1")(qdf => StreamingHybrid.rrfPerQueryIvf(
      qdf, index, postings, dfs, stats, k = 5, nprobe = 1,
      windowDuration = "1 minute", watermarkDelay = "1 minute"))
    assert(viaIvfPartial.map(_._1) == Set(1L, 2L))
    assert(viaIvfPartial.groupBy(_._1).forall(_._2.map(_._4) == Set(1, 2, 3, 4, 5)))
  }
}
