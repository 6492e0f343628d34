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
