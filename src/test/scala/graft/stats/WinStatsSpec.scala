package graft.stats

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** A1–A3 semantics; golden invariants from
  * `/root/reference/README.md:19-24` (4 wins / 5 valid → 80.0, 0 invalid).
  */
class WinStatsSpec extends AnyFunSuite with SparkSpec {

  private def stats(decisions: String*) = {
    import spark.implicits._
    WinStats.over(decisions.toDF("case_decision"), col("case_decision"))
      .collect().head
  }

  test("golden README response: 4 wins of 5 valid = 80.0") {
    val r = stats("appellant_won", "appellant_won", "appellant_won",
      "appellant_won", "appellant_lost")
    assert(r.getAs[Long]("win_count") == 4L)
    assert(r.getAs[Long]("total_valid_decisions") == 5L)
    assert(r.getAs[Double]("win_percentage") == 80.0)
    assert(r.getAs[Long]("invalid_decisions") == 0L)
    assert(r.getAs[Long]("result_count") == 5L)
  }

  test("division-by-zero guard: all invalid → 0.0 percentage") {
    val r = stats("invalid", "invalid", "invalid")
    assert(r.getAs[Long]("total_valid_decisions") == 0L)
    assert(r.getAs[Double]("win_percentage") == 0.0)
    assert(r.getAs[Long]("invalid_decisions") == 3L)
  }

  test("mixed with invalid: invalid excluded from the denominator") {
    val r = stats("appellant_won", "appellant_lost", "invalid")
    assert(r.getAs[Double]("win_percentage") == 50.0)
    assert(r.getAs[Long]("invalid_decisions") == 1L)
  }

  test("thirds round to 2dp") {
    val r = stats("appellant_won", "appellant_lost", "appellant_lost")
    assert(r.getAs[Double]("win_percentage") == 33.33)
  }
}
