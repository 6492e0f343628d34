package graft.classify

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.oracle.Sql

/** Ordered first-match-wins regex cascades — the reference's
  * classification pipeline (C1–C4) as a single Catalyst CASE WHEN
  * Column, plus a generator for the equivalent DuckDB SQL expression.
  * Both render from the same [[DecisionRules]] tables.
  *
  * The whole cascade is one codegen'd expression over a lowercased
  * text column: per-row cost is a handful of compiled-regex probes, no
  * UDF boundary, fully pushdown/prune-friendly — the shape that holds
  * at 100 TB (narrow map over the scan, zero shuffles).
  */
object Cascades {

  private def joined(pats: Seq[String]): String =
    if (pats.size == 1) pats.head else pats.map(p => s"(?:$p)").mkString("|")

  /** Cascade as a Spark Column. Matches Python semantics: lowercase the
    * text once, then unanchored `re.search` per rule in order.
    */
  def col(text: Column, rules: Seq[(Seq[String], String)], default: String): Column = {
    val lowered = lower(text)
    val first = when(lowered.rlike(joined(rules.head._1)), lit(rules.head._2))
    rules.tail
      .foldLeft(first) { case (acc, (pats, label)) =>
        acc.when(lowered.rlike(joined(pats)), lit(label))
      }
      .otherwise(lit(default))
  }

  /** Same cascade as a DuckDB SQL scalar expression over `textExpr`. */
  def sql(textExpr: String, rules: Seq[(Seq[String], String)], default: String): String = {
    val whens = rules.map { case (pats, label) =>
      s"WHEN regexp_matches(lower($textExpr), ${Sql.lit(joined(pats))}) THEN ${Sql.lit(label)}"
    }
    s"CASE ${whens.mkString(" ")} ELSE ${Sql.lit(default)} END"
  }

  // ----- the reference's three cascades, pre-bound -----

  /** C1: case decision (won/lost/invalid). */
  def decision(text: Column): Column =
    col(text, DecisionRules.decisionCascade, DecisionRules.Invalid)
  def decisionSql(textExpr: String): String =
    sql(textExpr, DecisionRules.decisionCascade, DecisionRules.Invalid)

  /** C2: document type. */
  def docType(text: Column): Column =
    col(text, DecisionRules.docTypeCascade, DecisionRules.GenericDocType)
  def docTypeSql(textExpr: String): String =
    sql(textExpr, DecisionRules.docTypeCascade, DecisionRules.GenericDocType)

  /** C3: document context (feeds the reference's LLM prompt). */
  def docContext(text: Column): Column =
    col(text, DecisionRules.docContextCascade, DecisionRules.GenericDocContext)
  def docContextSql(textExpr: String): String =
    sql(textExpr, DecisionRules.docContextCascade, DecisionRules.GenericDocContext)

  /** C1 + F7/F8 tail: the full embed-service decision shape
    * (`extract_and_embed_v2.py:87-159`) — regex cascade first; only
    * when every rule misses, extract the conclusion section (F7), let
    * the configured [[DecisionFallback]] decide from it and the C3
    * context, and validate the answer against the three-label enum
    * (out-of-enum → `invalid`, mirroring `:295-297`). With
    * [[NoFallback]] this IS the search-service copy
    * (`extract_and_search_v2.py:173-232`) and the conclusion/context
    * columns are never built.
    */
  def decisionWithFallback(text: Column, fallback: DecisionFallback): Column = {
    val initial = decision(text)
    if (fallback.isNoop) initial
    else {
      val conclusion = Conclusion.extractCol(text, docType(text))
      val raw = fallback.decide(conclusion, docContext(text))
      val validated = when(
        raw.isin(DecisionRules.Won, DecisionRules.Lost, DecisionRules.Invalid),
        raw).otherwise(lit(DecisionRules.Invalid))
      when(initial === DecisionRules.Invalid, validated).otherwise(initial)
    }
  }

  /** C4: metadata-enriched retry (`extract_and_embed_v2.py:340-343`) —
    * when the first pass is `invalid` and metadata exists, re-run the
    * cascade on `metadata + "\n\n" + text`. The `fallback` parameter
    * selects the service variant: the ingest service retries through
    * the F7/F8 tail as well (its retry re-enters the full
    * `determine_case_decision`), the search service (default,
    * [[NoFallback]]) stays regex-only.
    */
  def decisionWithRetry(text: Column, metadata: Column,
                        fallback: DecisionFallback = NoFallback): Column = {
    val initial = decisionWithFallback(text, fallback)
    when(initial === DecisionRules.Invalid && length(metadata) > 0,
      decisionWithFallback(concat(metadata, lit("\n\n"), text), fallback))
      .otherwise(initial)
  }
  def decisionWithRetrySql(textExpr: String, metaExpr: String): String = {
    val initial  = decisionSql(textExpr)
    val enriched = decisionSql(s"($metaExpr || chr(10) || chr(10) || $textExpr)")
    s"""CASE WHEN ($initial) = 'invalid' AND length($metaExpr) > 0
       | THEN ($enriched) ELSE ($initial) END""".stripMargin
  }
}
