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
    * an integral, non-null column. Returns the dense frame with every
    * bucket in [min, max] per key: `zeroFill` columns become 0 on
    * generated rows, `carryForward` columns repeat the last observed
    * value (null before a key's first observation — impossible for the
    * grid's first bucket, which is by construction observed). A NULL
    * key is a legitimate key (grid rows join back null-safely).
    *
    * `maxSpan` bounds each key's bucket range: the per-key grid is
    * materialized by `sequence()` as ONE in-memory array, so a single
    * outlier timestamp would otherwise amplify into an executor-sized
    * allocation. Exceeding the bound is a clear error, not an OOM —
    * clamp or filter outliers upstream.
    */
  def dense(observed: DataFrame, key: String, bucket: String,
            zeroFill: Seq[String], carryForward: Seq[String],
            maxSpan: Long = 1000000L): DataFrame = {
    require(!observed.columns.exists(_.startsWith("__")),
      "input columns starting with __ collide with gap-fill helper columns")
    val spans = observed.groupBy(key)
      .agg(min(bucket).as("__lo"), max(bucket).as("__hi"))
    // the guard sits INSIDE the sequence bound so column pruning can
    // never elide it: violating keys raise before allocating the array
    val hiGuarded = when(col("__hi") - col("__lo") < maxSpan, col("__hi"))
      .otherwise(raise_error(concat(
        lit("GapFill.dense: key "), col(key).cast("string"),
        lit(s" spans more than $maxSpan buckets — clamp or filter outliers")))
        .cast("long"))
    // grid columns carry reserved names so the join and the output
    // projection never collide with `observed`'s own key/bucket
    val grid = spans.select(col(key).as("__k"),
      explode(sequence(col("__lo"), hiGuarded)).as("__b"))
    val w = Window.partitionBy("__k").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe on the key: a null-key grid row must find its own
    // null-key observations
    val filled = grid.join(observed,
      col("__k") <=> observed(key) && col("__b") === observed(bucket),
      "left")
    val outCols = Seq(col("__k").as(key), col("__b").as(bucket)) ++
      zeroFill.map(c => coalesce(col(c), lit(0L)).as(c)) ++
      carryForward.map(c => last(col(c), ignoreNulls = true).over(w).as(c))
    filled.select(outCols: _*)
  }
}
