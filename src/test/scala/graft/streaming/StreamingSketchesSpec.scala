package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Sketches

/** [[Sketches.hllRegisters]] is already a valid STREAMING aggregation —
  * narrow hash projection + groupBy/max — so the distinct-count sketch
  * maintains itself incrementally in update mode with no extra code:
  * the register-merge-commutes property the batch spec pins is exactly
  * what the state store exploits per micro-batch. This spec proves the
  * claim end-to-end: registers after N micro-batches equal the batch
  * computation over the union of the batches.
  */
class StreamingSketchesSpec extends AnyFunSuite with SparkSpec {

  test("streaming HLL registers converge to the batch state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val q = Sketches.hllRegisters(ms.toDS().toDF("grp", "key"),
        col("grp"), col("key"))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("update").start()
    try {
      val batch1 = (0 until 800).map(i => ("g", s"a$i"))
      val batch2 = (0 until 800).map(i => ("g", s"b$i")) ++
        (0 until 400).map(i => ("g", s"a$i"))   // overlap re-observes keys
      ms.addData(batch1: _*)
      q.processAllAvailable()
      ms.addData(batch2: _*)
      q.processAllAvailable()

      // update mode re-emits changed registers: latest row per register
      // is the state (max over its emissions, since maxes only grow)
      val streamed = spark.table("hll_regs")
        .groupBy("grp", "reg").agg(max("mx").as("mx"))
        .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
      val batch = Sketches.hllRegisters(
          (batch1 ++ batch2).toDF("grp", "key"), col("grp"), col("key"))
        .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windowed grouped quantiles: exactly-once per window close, batch-equal") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(t0 + ms)
    val ms = MemoryStream[(String, Long, java.sql.Timestamp)]
    val out = StreamingQuantiles.windowedQuantilesByGroup(
      ms.toDS().toDF("grp", "v", "ts"), "grp", col("v"), Seq(0.5, 0.9))
    val q = out.writeStream.format("memory").queryName("wq_spec")
      .outputMode("append").start()
    try {
      // window 1: group a's values split ACROSS micro-batches — the
      // first stateful op must merge bucket counts before closing
      val w1a = (1L to 60L).map(i => ("a", i, ts(0)))
      val w1b = (61L to 100L).map(i => ("a", i, ts(1000))) ++
        Seq(("b", 7L, ts(2000)), ("b", 9L, ts(2000)))
      ms.addData(w1a); q.processAllAvailable()
      ms.addData(w1b); q.processAllAvailable()
      assert(spark.table("wq_spec").isEmpty,
        "append mode must emit nothing before the window closes")
      // window 2 data + watermark push closes window 1
      ms.addData(Seq(("a", 1000L, ts(7200000L))))
      q.processAllAvailable()
      ms.addData(Seq.empty[(String, Long, java.sql.Timestamp)])
      q.processAllAvailable()
      val rows = spark.table("wq_spec")
        .select("grp", "q", "value_lb").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      // batch selection over the SAME window-1 slice
      val batch = Sketches.logQuantilesBy(
          (w1a ++ w1b).map(t => (t._1, t._2)).toDF("grp", "v"),
          "grp", col("v"), Seq(0.5, 0.9))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .toSeq
      assert(rows.sorted == batch.sorted,
        s"windowed selection must equal batch: $rows vs $batch")
      // exactly-once: one row per (group, quantile), no re-emission
      assert(rows.size == rows.distinct.size && rows.size == 4,
        s"one emission per (group, q): $rows")
    } finally q.stop()
  }
}
