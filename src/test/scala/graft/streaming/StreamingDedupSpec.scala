package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class StreamingDedupSpec extends AnyFunSuite with SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("first arrival survives; in-horizon copies are dropped; whitespace variants collide") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.firstArrivals(
      ms.toDS().toDF("doc_id", "ts", "text"), "text",
      watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      ms.addData(
        (1L, ts(0), "alpha beta gamma"),
        (2L, ts(1), "alpha   beta\tgamma"),   // whitespace variant of 1
        (3L, ts(2), "wholly different text"),
        (4L, ts(3), "alpha beta gamma"))      // exact copy of 1
      q.processAllAvailable()
      val ids = spark.table("dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L), s"expected first arrivals only, got $ids")
    } finally q.stop()
  }

  test("stream-vs-corpus near-dup check: stateless join, one row per pair") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "an entirely different corpus document about engines")
    ).toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupsAgainstCorpus(
      ms.toDS().toDF("doc_id", "text"), corpus, "doc_id", "text",
      minJaccard = 0.5)
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      ms.addData(
        (1L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 100
        (2L, "wholly unrelated new submission text goes here"))
      q.processAllAvailable()
      val rows = spark.table("neardup")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      // identical texts collide in ALL bands — the first-match filter
      // must still emit exactly one row
      assert(rows == Seq((1L, 100L, 1.0)), s"got $rows")
    } finally q.stop()
  }

  test("a copy arriving beyond the watermark horizon is admitted again") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.firstArrivals(
      ms.toDS().toDF("doc_id", "ts", "text"), "text",
      watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup2")
      .outputMode("append").start()
    try {
      ms.addData((1L, ts(0), "recurring document"))
      q.processAllAvailable()
      // advance the watermark far past ts(0) + 10min, expiring the state
      ms.addData((2L, ts(120), "unrelated"))
      q.processAllAvailable()
      ms.addData((3L, ts(121), "recurring document"))
      q.processAllAvailable()
      val ids = spark.table("dedup2").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 3L),
        s"out-of-horizon copy must be re-admitted (state evicted), got $ids")
    } finally q.stop()
  }
}
