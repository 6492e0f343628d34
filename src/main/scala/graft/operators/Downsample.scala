package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Peak-preserving time-series downsampling — per (key, time bucket),
  * keep the single most ANOMALOUS observation (largest deviation from
  * the bucket mean) instead of an average that flattens every spike:
  * the LTTB-flavored reduction a telemetry/monitoring pipeline runs
  * before plotting or long-term retention (no reference analog; §2.7
  * events-family extension).
  *
  * Determinism contract: values quantize to exact integers at `scale`
  * and the argmax criterion is `|n·vqᵢ − S|` (S = exact bucket sum,
  * n = bucket count) — algebraically `n·|vqᵢ − mean|`, so the peak is
  * chosen WITHOUT ever computing a float mean (a float-sum mean is
  * shuffle-order-dependent, and an ulp of drift can flip a near-tied
  * argmax — a row-level divergence no output rounding absorbs). Ties
  * break to the earliest timestamp. Every emitted number is exact or
  * one final division of exact operands.
  *
  * Scale shape: one bucket aggregate (map-side partial) joined back to
  * the observations, then ONE max_by hash aggregate — no windows, no
  * per-bucket sorts; cost ∝ rows, state ∝ buckets.
  */
object Downsample {

  /** Downsample to one peak row per (key, bucket).
    * `bucketCol` must be integral, with FLOOR-division semantics if
    * derived by division (e.g. `(ts - pmod(ts, 3600e9)) div 3600e9`
    * for hourly epoch-nanos buckets — a bare `div` truncates toward
    * zero and mis-buckets pre-1970 timestamps). Returns
    * (key, bucket, peak_ts, peak_value, n_rows, bucket_mean) with
    * `peak_value`/`bucket_mean` at the quantization grid.
    */
  def peaks(df: DataFrame, keyCol: Column, bucketCol: Column,
            tsCol: Column, valueCol: Column,
            scale: Int = 1000000): DataFrame = {
    require(scale > 0, "scale must be positive")
    // null AND non-finite values carry no peak information: a NaN
    // would otherwise quantize to vq=0 via the non-ANSI double→long
    // cast (silently fabricating an observation at value 0) and an
    // infinity would saturate to Long.Max/Min and win every argmax
    val v = valueCol.cast("double")
    val obs = df.select(keyCol.as("key"), bucketCol.as("bucket"),
      tsCol.as("ts"),
      floor(v * scale + 0.5d).cast("long").as("vq"))
      .where(v.isNotNull && !isnan(v) &&
        v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity)
    val stats = obs.groupBy("key", "bucket")
      .agg(sum("vq").as("s"), count(lit(1)).as("n"))
    obs.join(stats, Seq("key", "bucket"))
      .groupBy("key", "bucket")
      .agg(
        max_by(struct(col("ts"), col("vq")),
          struct(abs(col("n") * col("vq") - col("s")).as("dev"),
            (-col("ts")).as("nt"))).as("peak"),
        first(col("n")).as("n_rows"),
        first(col("s")).as("s"))
      .select(col("key"), col("bucket"),
        col("peak.ts").as("peak_ts"),
        (col("peak.vq").cast("double") / scale).as("peak_value"),
        col("n_rows"),
        ((col("s").cast("double") / col("n_rows")) / scale).as("bucket_mean"))
  }

  /** DuckDB twin of [[peaks]] over a FROM-able relation exposing
    * (key, bucket, ts, v).
    */
  def peaksSql(fromSql: String, scale: Int = 1000000): String =
    s"""WITH obs AS MATERIALIZED (
       |  SELECT key, bucket, ts,
       |    CAST(floor(CAST(v AS DOUBLE) * $scale + 0.5) AS BIGINT) AS vq
       |  FROM ($fromSql) WHERE v IS NOT NULL AND isfinite(CAST(v AS DOUBLE))),
       |st AS MATERIALIZED (
       |  SELECT key, bucket, CAST(sum(vq) AS BIGINT) AS s,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM obs GROUP BY 1, 2)
       |SELECT key, bucket, peak_ts, peak_value, n_rows, bucket_mean FROM (
       |  SELECT o.key, o.bucket, o.ts AS peak_ts,
       |    CAST(o.vq AS DOUBLE) / $scale AS peak_value,
       |    st.n AS n_rows,
       |    (CAST(st.s AS DOUBLE) / st.n) / $scale AS bucket_mean,
       |    row_number() OVER (PARTITION BY o.key, o.bucket
       |      ORDER BY abs(st.n * o.vq - st.s) DESC, o.ts) AS rn
       |  FROM obs o JOIN st USING (key, bucket))
       |WHERE rn = 1""".stripMargin
}
