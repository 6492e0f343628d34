package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DownsampleSpec extends AnyFunSuite with SparkSpec {

  test("keeps the most anomalous row per bucket; ties go to earliest ts") {
    import spark.implicits._
    val rows = Seq(
      // key a, bucket 0: values 1, 1, 10 -> 10 is the peak
      ("a", 0L, 100L, 1.0), ("a", 0L, 200L, 1.0), ("a", 0L, 300L, 10.0),
      // key a, bucket 1: symmetric 0, 4 both deviate 2 from mean 2 ->
      // tie on |dev|, earliest ts (400) wins
      ("a", 1L, 400L, 0.0), ("a", 1L, 500L, 4.0),
      // key b, bucket 0: single row is its own peak
      ("b", 0L, 600L, 7.5)
    ).toDF("k", "b", "ts", "v")
    val out = Downsample.peaks(rows, col("k"), col("b"), col("ts"), col("v"))
      .orderBy("key", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 0L, 300L, 10.0, 3L),
      ("a", 1L, 400L, 0.0, 2L),
      ("b", 0L, 600L, 7.5, 1L)))
  }

  test("downsample is aggregate-shaped: no window, map-side partials") {
    import spark.implicits._
    val rows = Seq(("a", 0L, 1L, 1.0), ("a", 0L, 2L, 2.0)).toDF("k", "b", "ts", "v")
    val plan = Downsample.peaks(rows, col("k"), col("b"), col("ts"), col("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
    assert(plan.contains("partial"), s"two-phase aggregation expected:\n$plan")
  }
}
