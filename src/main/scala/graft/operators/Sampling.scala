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
}
