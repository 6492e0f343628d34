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
}
