package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain corpus shaping — the source-level controls every
  * web-scale training recipe applies after document-level quality
  * filtering (RefinedWeb §3.3's per-domain caps, the Pile's
  * per-source epochs, Gopher's MassiveWeb subsetting): no single
  * domain may dominate the mix, however much of it the crawl has.
  *
  * Both passes are deterministic functions of (domain, score, id) —
  * no RNG — so a re-run keeps the same documents, and a later
  * pipeline stage can join back against "the capped corpus" exactly
  * (the [[graft.operators.Sampling]] reproducibility argument).
  *
  * Scale shape: one hash shuffle on the domain key each.
  *  - [[domainCap]] ranks with `row_number ≤ n`, which Spark 3.5+
  *    turns into a map-side WindowGroupLimit — each task forwards at
  *    most n rows per domain before the exchange, so a
  *    billion-page domain costs its cap, not its size, in shuffle
  *    volume (plan-gated in PlanShapeSpec).
  *  - [[domainTokenBudget]] needs the running sum over each domain's
  *    quality-ordered prefix, which is inherently sequential per
  *    domain; rank-cap first (the composition below) so the window
  *    only ever sorts capped-size groups. For a catastrophically
  *    skewed single domain, the two-phase scan of
  *    [[graft.operators.Prefix]] over a range-partitioned (domain,
  *    rank) ordering is the escape hatch.
  */
object Curation {

  /** Keep at most `maxDocs` per domain, preferring high `scoreCol`
    * (ties → ascending id: deterministic under duplicate scores).
    * Emits the input columns plus the 1-based `domain_rank`.
    */
  def domainCap(df: DataFrame, domainCol: Column, idCol: Column,
                scoreCol: Column, maxDocs: Int): DataFrame = {
    require(maxDocs > 0, s"maxDocs must be positive, got $maxDocs")
    require(!df.columns.contains("domain_rank"),
      "domainCap emits column domain_rank; rename it on the input")
    val w = Window.partitionBy(domainCol).orderBy(scoreCol.desc, idCol.asc)
    df.withColumn("domain_rank", row_number().over(w))
      .where(col("domain_rank") <= maxDocs)
  }

  /** DuckDB twin of [[domainCap]] (QUALIFY keeps the filter adjacent
    * to the window). `row_number()` CAST to INTEGER to match Spark.
    */
  def domainCapSql(table: String, domainExpr: String, idExpr: String,
                   scoreExpr: String, maxDocs: Int,
                   selectCols: String): String =
    s"""SELECT $selectCols,
       |  CAST(row_number() OVER (PARTITION BY $domainExpr
       |    ORDER BY $scoreExpr DESC, $idExpr) AS INTEGER) AS domain_rank
       |FROM $table
       |QUALIFY domain_rank <= $maxDocs""".stripMargin

  /** Keep each domain's quality-ordered prefix while the RUNNING token
    * total (inclusive of the current document) stays within
    * `maxTokens` — the budgeted form of [[domainCap]]: domains are
    * equalized by token mass, not document count, which is what the
    * training mix actually consumes. A document that would cross the
    * budget is dropped, as are all after it (prefix semantics, not
    * knapsack — deterministic and order-stable).
    */
  def domainTokenBudget(df: DataFrame, domainCol: Column, idCol: Column,
                        scoreCol: Column, tokensCol: Column,
                        maxTokens: Long): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(!df.columns.contains("cum_tokens"),
      "domainTokenBudget emits column cum_tokens; rename it on the input")
    val w = Window.partitionBy(domainCol).orderBy(scoreCol.desc, idCol.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol).over(w))
      .where(col("cum_tokens") <= maxTokens)
  }

  /** DuckDB twin of [[domainTokenBudget]]. */
  def domainTokenBudgetSql(table: String, domainExpr: String, idExpr: String,
                           scoreExpr: String, tokensExpr: String,
                           maxTokens: Long, selectCols: String): String =
    s"""SELECT $selectCols,
       |  CAST(sum($tokensExpr) OVER (PARTITION BY $domainExpr
       |    ORDER BY $scoreExpr DESC, $idExpr
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |FROM $table
       |QUALIFY cum_tokens <= $maxTokens""".stripMargin
}
