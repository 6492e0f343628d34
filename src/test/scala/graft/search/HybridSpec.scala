package graft.search

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class HybridSpec extends AnyFunSuite with SparkSpec {

  test("rrfFuse matches hand-computed reciprocal-rank sums") {
    import spark.implicits._
    // route A ranks: 1→doc 5, 2→doc 7, 3→doc 9
    // route B ranks: 1→doc 7, 2→doc 5 (doc 9 absent)
    val a = Seq((5L, 1L), (7L, 2L), (9L, 3L)).toDF("id", "rank")
    val b = Seq((7L, 1L), (5L, 2L)).toDF("id", "rank")
    val out = Hybrid.rrfFuse(Seq(a, b), k0 = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map(
      5L -> r4(1.0 / 61 + 1.0 / 62),
      7L -> r4(1.0 / 62 + 1.0 / 61),
      9L -> r4(1.0 / 63)))
    // symmetric ranks fuse to the same score — rank-only, score-free
    assert(out(5L) == out(7L))
  }

  test("ranked assigns deterministic 1-based ranks with id tie-break") {
    import spark.implicits._
    val scored = Seq((3L, 0.9), (1L, 0.9), (2L, 0.5)).toDF("id", "s")
    val out = Hybrid.ranked(scored, col("id"),
        Seq(col("s").desc, col("id").asc))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 3L -> 2L, 2L -> 3L))
  }

  test("a single route fuses to its own reciprocal ranks") {
    import spark.implicits._
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val out = Hybrid.rrfFuse(Seq(a))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map(1L -> r4(1.0 / 61), 2L -> r4(1.0 / 62)))
  }
}
