package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — Population Stability Index (PSI)
  * between a BASELINE and a CURRENT observation set, per group: the
  * standard go/no-go metric a production data pipeline computes before
  * trusting a new corpus drop or a retrained embedder (PSI < 0.1
  * stable, 0.1–0.25 drifting, > 0.25 shifted — the classic credit-
  * scoring thresholds). The reference has nothing in this family —
  * extension surface beside the quality/curation operators.
  *
  * `PSI = Σ_buckets (p_i − q_i) · ln(p_i / q_i)` with add-one
  * (Laplace) smoothing so empty buckets on either side stay finite:
  * `p_i = (cb_i + 1) / (nb + B)` over the union bucket set (B = union
  * bucket count per group). Every term is ≥ 0 (the factors share
  * sign), so the scaled-integer summation is monotone-safe.
  *
  * Scale shape: one bounded aggregation per side (counts per (group,
  * bucket) — map-side combining), one full-outer join of two BOUNDED
  * bucket tables, per-group totals as window aggregates over that
  * bounded table (one shuffle of buckets, never observations), one
  * final fold. Observation rows are scanned exactly once per side.
  *
  * Cross-engine determinism: integer counts, single double divisions,
  * per-term 1e-6-grid rounding with an exact long sum, final 4dp —
  * the house recipe for ln-bearing scores (the BM25 pattern).
  */
object Drift {

  /** PSI from pre-aggregated bucket counts `(groupName, bucket, cnt)`
    * — the form a complete-mode streaming bucket state already
    * maintains ([[graft.streaming]] routes feed this directly).
    */
  def psiFromCounts(baseCounts: DataFrame, currCounts: DataFrame,
                    groupName: String): DataFrame = {
    val b = baseCounts.select(col(groupName), col("bucket"),
      col("cnt").as("cb"))
    val c = currCounts.select(col(groupName), col("bucket"),
      col("cnt").as("cc"))
    val w = Window.partitionBy(groupName)
    b.join(c, Seq(groupName, "bucket"), "full_outer")
      .na.fill(0L, Seq("cb", "cc"))
      .withColumn("nb", sum(col("cb")).over(w))
      .withColumn("nc", sum(col("cc")).over(w))
      .withColumn("nbk", count(lit(1)).over(w))
      .withColumn("p",
        (col("cb") + 1).cast("double") / (col("nb") + col("nbk")).cast("double"))
      .withColumn("q",
        (col("cc") + 1).cast("double") / (col("nc") + col("nbk")).cast("double"))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .groupBy(col(groupName))
      .agg(
        round(sum(round(col("term") * 1000000d).cast("long")) / 1000000d, 4)
          .as("psi"),
        max(col("nb")).as("n_base"), max(col("nc")).as("n_curr"))
  }

  /** PSI over raw observation rows: bucketize with `bucketCol` (any
    * integer-valued expression — fixed-width bins, log buckets,
    * deciles), count per (group, bucket) on each side, then
    * [[psiFromCounts]].
    */
  def psiByGroup(base: DataFrame, curr: DataFrame, groupName: String,
                 bucketCol: Column): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      df.select(col(groupName), bucketCol.cast("long").as("bucket"))
        .groupBy(col(groupName), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
    psiFromCounts(counts(base), counts(curr), groupName)
  }

  /** Nearest-anchor cluster id for an embedding — the bucketizer an
    * EMBEDDING-distribution drift monitor needs (a scalar histogram
    * cannot see a rotated or re-trained embedder; the cluster
    * occupancy histogram can). A pure `least()` fold over the bounded
    * anchor list: no shuffle, no per-row fan-out, codegen-friendly —
    * the same per-row cost as [[graft.vector.VectorKernels.nearestCentroids]]
    * at nprobe=1, but with the 4dp-rounded distance + id tie-break
    * that lets DuckDB replay the assignment bit-exactly. Production
    * anchors are [[graft.vector.Ann.buildIvf]] centroids (DriftSpec
    * pins that composition); the oracle gate passes corpus-row anchors
    * so the SQL twin can reconstruct them.
    */
  def embeddingBucket(emb: Column, anchors: Seq[(Int, Seq[Float])]): Column = {
    require(anchors.size >= 2, s"need >= 2 anchors, got ${anchors.size}")
    least(anchors.map { case (cid, v) =>
      struct(round(graft.vector.Distance.l2(emb, lit(v.toArray)), 4).as("d"),
        lit(cid).as("cid"))
    }: _*).getField("cid")
  }

  /** Embedding-distribution drift: PSI between the nearest-anchor
    * cluster histograms of a baseline and a current embedding set —
    * [[embeddingBucket]] composed with [[psiByGroup]]. One scan per
    * side, bounded (1 × nlist) bucket tables; the observation rows
    * never shuffle.
    */
  def psiEmbedding(base: DataFrame, curr: DataFrame, emb: Column,
                   anchors: Seq[(Int, Seq[Float])]): DataFrame =
    psiByGroup(base.withColumn("metric", lit("embedding")),
      curr.withColumn("metric", lit("embedding")), "metric",
      embeddingBucket(emb, anchors))

  /** Nearest-anchor assignment as a `(oid, cid)` subquery — THE
    * replayable assignment contract (4dp L2, anchor-id tie-break)
    * every oracle composing with [[embeddingBucket]] must build on,
    * so the contract exists in exactly one SQL string. `obsSql`
    * selects `(oid, e)` observation rows, `anchorsSql` selects
    * `(cid, cemb)` anchors.
    */
  def assignSql(obsSql: String, anchorsSql: String): String =
    s"""SELECT oid, cid FROM (
       |  SELECT o.oid, a.cid,
       |    row_number() OVER (PARTITION BY o.oid
       |      ORDER BY ${graft.oracle.Sql.l2("o.e", "a.cemb")}, a.cid) AS rn
       |  FROM ($obsSql) o, ($anchorsSql) a) WHERE rn = 1""".stripMargin

  /** DuckDB twin of [[psiEmbedding]]: [[assignSql]] shaped as the
    * `(g, bucket)` rows [[psiByGroupSql]] consumes.
    */
  def embeddingBucketSql(obsSql: String, anchorsSql: String): String =
    s"""SELECT 'embedding' AS g, cid AS bucket FROM (
       |${assignSql(obsSql, anchorsSql)})""".stripMargin

  /** DuckDB twin of [[psiByGroup]]: `baseSql`/`currSql` select
    * `(g, bucket)` observation rows; identical smoothing, grid
    * summation, and rounding.
    */
  def psiByGroupSql(baseSql: String, currSql: String,
                    groupAlias: String): String =
    s"""WITH bb AS (SELECT g, bucket, count(*) AS cb FROM ($baseSql) GROUP BY 1, 2),
       |cc AS (SELECT g, bucket, count(*) AS ccnt FROM ($currSql) GROUP BY 1, 2),
       |j AS (
       |  SELECT coalesce(bb.g, cc.g) AS g,
       |    coalesce(bb.bucket, cc.bucket) AS bucket,
       |    coalesce(cb, 0) AS cb, coalesce(ccnt, 0) AS ccnt
       |  FROM bb FULL OUTER JOIN cc
       |    ON bb.g = cc.g AND bb.bucket = cc.bucket),
       |t AS (
       |  SELECT g, cb, ccnt,
       |    SUM(cb) OVER (PARTITION BY g) AS nb,
       |    SUM(ccnt) OVER (PARTITION BY g) AS nc,
       |    COUNT(*) OVER (PARTITION BY g) AS nbk
       |  FROM j),
       |terms AS (
       |  SELECT g, nb, nc,
       |    (CAST(cb + 1 AS DOUBLE) / CAST(nb + nbk AS DOUBLE)
       |     - CAST(ccnt + 1 AS DOUBLE) / CAST(nc + nbk AS DOUBLE))
       |    * ln((CAST(cb + 1 AS DOUBLE) / CAST(nb + nbk AS DOUBLE))
       |         / (CAST(ccnt + 1 AS DOUBLE) / CAST(nc + nbk AS DOUBLE))) AS term
       |  FROM t)
       |SELECT g AS $groupAlias,
       |  round(SUM(CAST(round(term * 1000000) AS BIGINT)) / 1000000.0, 4) AS psi,
       |  CAST(max(nb) AS BIGINT) AS n_base, CAST(max(nc) AS BIGINT) AS n_curr
       |FROM terms GROUP BY 1""".stripMargin
}
