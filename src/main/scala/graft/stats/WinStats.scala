package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Appellant win statistics over a (small) result set — reference
  * A1–A3, `/root/reference/extract_and_search_v2.py:162-168` plus the
  * response-time fields at `:369-374`.
  *
  * Single-pass conditional aggregation (map-side partial agg; the
  * result set is already tiny so this is driver-cheap, but the same
  * expression runs unchanged over billions of rows).
  */
object WinStats {
  val Won     = "appellant_won"
  val Lost    = "appellant_lost"
  val Invalid = "invalid"

  /** Aggregate a DataFrame bearing `decisionCol` into one stats row:
    * win_count, total_valid_decisions, win_percentage (2dp, 0.0 when no
    * valid decisions — the reference's divide-by-zero guard),
    * invalid_decisions, result_count.
    */
  def over(results: DataFrame, decisionCol: Column): DataFrame = {
    val agg = results.agg(
      sum(when(decisionCol === Won, 1L).otherwise(0L)).as("win_count"),
      sum(when(decisionCol === Won || decisionCol === Lost, 1L).otherwise(0L))
        .as("total_valid_decisions"),
      count(lit(1)).as("result_count"))
    agg.select(
      col("win_count"),
      col("total_valid_decisions"),
      when(col("total_valid_decisions") > 0,
        round(col("win_count") * 100.0 / col("total_valid_decisions"), 2))
        .otherwise(0.0).as("win_percentage"),
      (col("result_count") - col("total_valid_decisions")).as("invalid_decisions"),
      col("result_count"))
  }
}
