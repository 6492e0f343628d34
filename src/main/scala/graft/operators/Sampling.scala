package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible alternative
  * to `rand()`-based sampling for training-data curation. Rows rank by
  * `sha256(salt ++ id)`: a fixed pseudo-random permutation that is a
  * pure function of row identity — independent of partitioning, task
  * retries, and cluster size (none of which hold for `rand()`), and
  * re-runnable bit-for-bit on any engine with sha256 (the DuckDB
  * oracle orders by the same hex strings). Changing `salt` redraws the
  * whole sample; keeping it pins the sample across pipeline re-runs —
  * exactly the property a 100 TB curation pass needs when a later
  * stage joins back against "the sampled ids".
  *
  * Scale shape: the global form is `ORDER BY hash LIMIT n` —
  * TakeOrderedAndProject (per-partition n-heaps merged on the driver),
  * no global sort, no shuffle of the corpus. The per-group form ranks
  * inside a window; group cardinality ≫ `nPer` keeps state bounded by
  * Spark's WindowGroupLimit pushdown (rank-limit filter applied
  * map-side before the shuffle in 3.5+).
  *
  * Ties: sha256 collisions are cryptographically negligible, but the
  * orderings still append `id` so equal-hash rows (e.g. duplicate ids
  * fed in by mistake) cannot make the cut nondeterministic.
  */
object Sampling {

  /** The ranking key: lowercase hex sha256 of salt ++ decimal id. */
  def hashKey(idCol: Column, salt: String): Column =
    sha2(concat(lit(salt), idCol.cast("string")), 256)

  /** DuckDB twin of [[hashKey]] (both engines emit lowercase hex, so
    * string comparison orders identically).
    */
  def hashKeySql(idExpr: String, salt: String): String =
    s"sha256('$salt' || CAST($idExpr AS VARCHAR))"

  /** Deterministic n-row sample of `df`. */
  def sampleN(df: DataFrame, idCol: Column, n: Int,
              salt: String = "graft"): DataFrame = {
    require(n > 0, "n must be positive")
    df.orderBy(hashKey(idCol, salt), idCol).limit(n)
  }

  /** Deterministic `nPer`-row sample from every group — stratified
    * downsampling with exact per-stratum counts (a group smaller than
    * `nPer` is kept whole).
    */
  def sampleNPerGroup(df: DataFrame, groupCol: Column, idCol: Column,
                      nPer: Int, salt: String = "graft"): DataFrame = {
    require(nPer > 0, "nPer must be positive")
    require(!df.columns.contains("__rn"),
      "sampleNPerGroup reserves column name __rn; rename it on the input")
    val w = Window.partitionBy(groupCol)
      .orderBy(hashKey(idCol, salt), idCol)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= nPer)
      .drop("__rn")
  }

  /** Deterministic DOMAIN-MIXTURE downsampling: keep each row with its
    * group's rate (percent, 0–100), decided by the row's own hash —
    * the "mix web at 30%, books at 100%, code at 60%" pass of a
    * training-data recipe. A pure per-row projection + filter: no
    * window, no shuffle, no per-group state — THE mixture route at
    * 100 TB (rates are approximate per group, error O(1/√n); use
    * [[sampleNPerGroup]] when a stratum needs an exact count).
    *
    * The decision reuses the first 8 hex chars of the sha256 rank key
    * as a uniform draw in [0, 2^32): `draw * 100 < rate * 2^32` keeps
    * exactly the rate fraction of hash space, with no float rounding
    * at the boundary. Unknown groups (no rate given) default to 0 —
    * curation recipes enumerate their domains explicitly.
    */
  def mixtureSample(df: DataFrame, groupCol: Column, idCol: Column,
                    ratesPct: Map[String, Int],
                    salt: String = "graft"): DataFrame = {
    require(ratesPct.nonEmpty, "ratesPct must be non-empty")
    require(ratesPct.values.forall(r => r >= 0 && r <= 100),
      s"rates must be 0..100 percent: $ratesPct")
    val rate = ratesPct.foldLeft(lit(0): Column) { case (acc, (g, r)) =>
      when(groupCol === g, lit(r)).otherwise(acc)
    }
    val draw = conv(substring(hashKey(idCol, salt), 1, 8), 16, 10).cast("long")
    df.where(draw * 100L < rate.cast("long") * 4294967296L)
  }

  /** Per-row WEIGHTED Bernoulli keep: each row survives with
    * probability `wPpm / 1e6`, where `wPpm` is any integer expression
    * in parts-per-million (out-of-range values clamp to [0, 1e6]) —
    * the quality-weighted generalization of [[mixtureSample]] ("keep
    * documents in proportion to their quality score"). Same integer
    * hash-space cut (`draw · 1e6 < wPpm · 2^32`, both under 2^53 so
    * the longs are exact), same scale shape: a pure narrow filter,
    * reproducible across engines, partitionings, and retries.
    */
  def weightedSample(df: DataFrame, idCol: Column, wPpm: Column,
                     salt: String = "graft"): DataFrame = {
    val w = least(greatest(wPpm.cast("long"), lit(0L)), lit(1000000L))
    val draw = conv(substring(hashKey(idCol, salt), 1, 8), 16, 10).cast("long")
    df.where(draw * 1000000L < w * 4294967296L)
  }

  /** DuckDB twin of [[weightedSample]]'s keep-predicate. */
  def weightedSampleSql(idExpr: String, wPpmExpr: String,
                        salt: String = "graft"): String =
    s"""(CAST(('0x' || substring(${hashKeySql(idExpr, salt)}, 1, 8)) AS UBIGINT) * 1000000
       | < least(greatest(CAST($wPpmExpr AS BIGINT), 0), 1000000) * 4294967296)""".stripMargin

  /** TEMPERATURE-scaled domain rebalance — the multilingual-LM mixture
    * pass (mC4 / XLM-R style: sample domains ∝ p_g^α with α < 1 so
    * low-resource groups gain relative mass). Each group `g` of size
    * `n_g` keeps rate `(n_g / n_min)^(α−1)` — the per-row rate that
    * reshapes group masses from `∝ n_g` toward `∝ n_g^α`, normalized
    * so the SMALLEST group keeps everything (α = 1 keeps all rows;
    * α = 0 equalizes expected group masses). Rates are floored into
    * integer ppm and applied with the same exact hash-space cut as
    * [[weightedSample]] — deterministic across engines, partitionings,
    * and retries.
    *
    * Scale shape: one tiny per-group count (partial-aggregated), a
    * 1-row min, and a BROADCAST of the group→ppm table back onto a
    * narrow per-row filter — no window, no per-group state. Group
    * rates derive from exact counts; at 100 TB group cardinality is
    * domains/languages (small), so the stats stay driver-sized.
    */
  def temperatureSample(df: DataFrame, groupCol: Column, idCol: Column,
                        alpha: Double, salt: String = "graft"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val taken = df.columns.toSet
    for (c <- Seq("__g", "__n", "__ppm"))
      require(!taken.contains(c), s"temperatureSample reserves column $c")
    val counts = df.groupBy(groupCol.as("__g")).agg(count(lit(1)).as("__n"))
    val mn = counts.agg(min("__n").as("__mn"))
    val rates = counts.crossJoin(broadcast(mn)).select(col("__g"),
      floor(pow(col("__n").cast("double") / col("__mn"), lit(alpha - 1.0))
        * 1000000).cast("long").as("__ppm"))
    val draw = conv(substring(hashKey(idCol, salt), 1, 8), 16, 10).cast("long")
    df.join(broadcast(rates), groupCol === col("__g"))
      .where(draw * 1000000L < col("__ppm") * 4294967296L)
      .drop("__g", "__ppm")
  }

  /** DuckDB twin of [[temperatureSample]]: full query returning
    * `selectCols` of `table`'s kept rows. `groupExpr`/`idExpr` are
    * column expressions over `table`.
    */
  def temperatureSampleSql(table: String, groupExpr: String, idExpr: String,
                           alpha: Double, selectCols: Seq[String],
                           salt: String = "graft"): String = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val proj = selectCols.map(c => s"d.$c").mkString(", ")
    s"""WITH __counts AS (
       |  SELECT $groupExpr AS g, CAST(count(*) AS BIGINT) AS n
       |  FROM $table GROUP BY 1
       |), __mn AS (SELECT min(n) AS mn FROM __counts),
       |__rates AS (
       |  SELECT g, CAST(floor(power(CAST(n AS DOUBLE) / mn, $alpha - 1.0)
       |    * 1000000) AS BIGINT) AS ppm
       |  FROM __counts, __mn
       |)
       |SELECT $proj FROM $table d JOIN __rates r ON d.$groupExpr = r.g
       |WHERE CAST(('0x' || substring(${hashKeySql(s"d.$idExpr", salt)}, 1, 8)) AS UBIGINT)
       |  * 1000000 < r.ppm * 4294967296""".stripMargin
  }

  /** DuckDB twin of [[mixtureSample]]'s keep-predicate. */
  def mixtureSampleSql(groupExpr: String, idExpr: String,
                       ratesPct: Map[String, Int],
                       salt: String = "graft"): String = {
    val cases = ratesPct.map { case (g, r) =>
      s"WHEN ${graft.oracle.Sql.lit(g)} THEN $r"
    }.mkString(" ")
    s"""(CAST(('0x' || substring(${hashKeySql(idExpr, salt)}, 1, 8)) AS UBIGINT) * 100
       | < (CASE $groupExpr $cases ELSE 0 END) * 4294967296)""".stripMargin
  }
}
