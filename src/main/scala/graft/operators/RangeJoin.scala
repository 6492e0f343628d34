package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (band) range join — the scale-safe plan for a PURE non-equi
  * temporal predicate `|l.ts − r.ts| ≤ radius` with no equi key.
  * Catalyst plans such a join as a broadcast nested loop (quadratic,
  * and impossible when neither side fits a broadcast); the standard
  * engine rewrite is to manufacture an equi key by binning time:
  *
  *   - each right row lands in one bin  `⌊ts / W⌋`;
  *   - each left row explodes to the bins covering `[ts−radius,
  *     ts+radius]` (with W = radius that is ≤ 3 bins — bounded
  *     fan-out);
  *   - a hash equi-join on the bin plus the residual `|Δts| ≤ radius`
  *     filter yields each qualifying pair exactly once (each right row
  *     exists in exactly one bin, so no dedup step is needed).
  *
  * The shuffle is a plain hash partition on the bin key; hot bins (time
  * skew) are ordinary join skew, handled by AQE's skew-join splitting.
  * This mirrors the reference's only non-equi access path — Milvus's
  * range-limited candidate probe — restated as a relational rewrite.
  *
  * Timestamps are `long` epoch offsets (any unit, as long as both
  * sides and `radius` agree — the harness `events` table carries epoch
  * nanos). Values must be non-negative: `/` is truncating division,
  * which equals floor only for non-negative operands.
  */
object RangeJoin {

  /** All pairs (l, r) with `|l[lTs] − r[rTs]| ≤ radius`. Column names
    * of `left` and `right` must be disjoint (alias before calling —
    * this is a join, both sides' columns survive).
    *
    * `binWidth` defaults to `radius` (3 bins per left row); widen it
    * when `radius` is tiny relative to row density to keep the
    * explode factor at 3 while trading residual-filter selectivity.
    */
  def bandJoin(left: DataFrame, right: DataFrame, lTs: String, rTs: String,
               radius: Long, binWidth: Long = 0L): DataFrame = {
    require(radius >= 0, "radius must be non-negative")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    // withColumn REPLACES silently — a pre-existing helper column would
    // corrupt the bin key rather than error
    val reserved = (left.columns ++ right.columns).toSet.intersect(Set("__bin", "__rbin"))
    require(reserved.isEmpty,
      s"bandJoin reserves column names __bin/__rbin; rename on the inputs: $reserved")
    val w = if (binWidth > 0L) binWidth else math.max(radius, 1L)
    // `div` is exact integer division — `/` would promote to double,
    // which cannot represent epoch-nanos magnitudes exactly
    val lBinned = left.withColumn("__bin",
      explode(sequence(expr(s"(`$lTs` - ${radius}L) div ${w}L"),
        expr(s"(`$lTs` + ${radius}L) div ${w}L"))))
    val rBinned = right.withColumn("__rbin", expr(s"`$rTs` div ${w}L"))
    lBinned.join(rBinned,
      col("__bin") === col("__rbin") &&
        abs(col(lTs) - col(rTs)) <= radius)
      .drop("__bin", "__rbin")
  }
}
