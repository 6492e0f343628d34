package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: expand a sparse (key, bucket) frame to
  * the FULL integer bucket range each key spans, zero-filling count
  * columns and carrying measurement columns forward — the gap-fill /
  * resample step every downstream window computation needs (rolling
  * averages and sessionless charts are wrong on sparse buckets).
  *
  * Scale shape: the grid is generated per key with
  * `explode(sequence(lo, hi))` — rows ∝ each key's SPAN (time range ÷
  * bucket width), independent of the corpus's row count; the
  * forward-fill window partitions by key and orders by bucket, so its
  * sort is span-bounded too. One aggregation (spans), one left join
  * back to observations (hash, on (key, bucket)), one window — no
  * corpus-sized sort anywhere.
  */
object GapFill {

  /** `observed`: one row per present (key, bucket) — `bucket` must be
    * an integral column. Returns the dense frame with every bucket in
    * [min, max] per key: `zeroFill` columns become 0 on generated
    * rows, `carryForward` columns repeat the last observed value
    * (null before a key's first observation — impossible for the
    * grid's first bucket, which is by construction observed).
    */
  def dense(observed: DataFrame, key: String, bucket: String,
            zeroFill: Seq[String], carryForward: Seq[String]): DataFrame = {
    val spans = observed.groupBy(key)
      .agg(min(bucket).as("__lo"), max(bucket).as("__hi"))
    val grid = spans.select(col(key),
      explode(sequence(col("__lo"), col("__hi"))).as(bucket))
    val w = Window.partitionBy(key).orderBy(bucket)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = grid.join(observed, Seq(key, bucket), "left")
    val outCols = Seq(col(key), col(bucket)) ++
      zeroFill.map(c => coalesce(col(c), lit(0L)).as(c)) ++
      carryForward.map(c => last(col(c), ignoreNulls = true).over(w).as(c))
    filled.select(outCols: _*)
  }
}
