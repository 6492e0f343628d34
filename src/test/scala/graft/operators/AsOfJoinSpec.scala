package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  test("picks the latest right row at or before each left timestamp, per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, "a", 100L), (2L, "a", 205L), (3L, "b", 50L), (4L, "b", 300L)
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("a", 90L, 1.0), ("a", 100L, 2.0), ("a", 200L, 3.0),   // same-instant (100) visible
      ("b", 100L, 9.0)                                        // after trade 3 → null for it
    ).toDF("sym", "ts", "px")

    val out = AsOfJoin.asOf(trades, quotes, "sym", "ts", Seq("px"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map(
      1L -> Some(2.0),  // quote at exactly ts=100 wins over ts=90
      2L -> Some(3.0),  // latest ≤ 205 is ts=200
      3L -> None,       // no quote at or before ts=50
      4L -> Some(9.0)))
  }
}
