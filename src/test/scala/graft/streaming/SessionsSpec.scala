package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SessionsSpec extends AnyFunSuite with SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("flatMapGroupsWithState sessionize: gap split, accumulation, timeout close") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val out = Sessions.sessionize(
      ms.toDS().toDF("user_id", "ts", "value"), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 0,10,20 min (one session); user 2: event at 5
      ms.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(20), 3.0),
        (2L, ts(5), 5.0))
      q.processAllAvailable()
      // nothing closed yet — watermark hasn't passed any gap
      assert(spark.table("sessions").count() == 0)

      // user 1 reappears at minute 120: gap > 30 closes the first
      // session directly; the event also drives the watermark far past
      // user 2's (5 + 30) timeout
      ms.addData((1L, ts(120), 4.0))
      q.processAllAvailable()
      // timeouts fire on the NEXT trigger after the watermark advances;
      // an empty batch is enough
      ms.addData()
      q.processAllAvailable()

      val rows = spark.table("sessions")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(rows.contains((1L, ts(0), ts(20), 3L, 6.0)),
        s"user 1 first session missing from $rows")
      assert(rows.contains((2L, ts(5), ts(5), 1L, 5.0)),
        s"user 2 timeout session missing from $rows")
      // user 1's second session (minute 120) is still open — not emitted
      assert(!rows.exists(r => r._1 == 1L && r._4 == 1L))
    } finally q.stop()
  }

  test("late in-watermark event older than the open session lowers session_start") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val out = Sessions.sessionize(
      ms.toDS().toDF("user_id", "ts", "value"), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      // session opens at minute 20; watermark moves to 20 - 10 = 10
      ms.addData((1L, ts(20), 1.0))
      q.processAllAvailable()
      // minute-15 event arrives LATE (inside the watermark) and
      // predates the open session's start — must merge backward
      ms.addData((1L, ts(15), 2.0))
      q.processAllAvailable()
      // minute-120 event is > gap past 20: closes the merged session
      ms.addData((1L, ts(120), 3.0))
      q.processAllAvailable()
      val rows = spark.table("late_sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(rows.contains((1L, ts(15), ts(20), 2L)),
        s"backward-merged session missing: ${rows.toSeq}")
    } finally q.stop()
  }

  test("stream-stream watermarked join attributes purchases to preceding views") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val out = Sessions.attributedPurchases(
      views.toDS().toDF("user_id", "ts", "value"),
      purchases.toDS().toDF("user_id", "ts", "value"), windowMinutes = 30)
    val q = out.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      views.addData((1L, ts(0), 10.0), (1L, ts(50), 11.0), (2L, ts(0), 12.0))
      // purchase at minute 20: within 30 of view@0 (user 1) only;
      // purchase at minute 55: within 30 of view@50 only
      purchases.addData((1L, ts(20), 100.0), (1L, ts(55), 200.0))
      q.processAllAvailable()
      val rows = spark.table("attributed")
        .select("user_id", "view_value", "purchase_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, 10.0, 100.0), (1L, 11.0, 200.0)))
    } finally q.stop()
  }
}
