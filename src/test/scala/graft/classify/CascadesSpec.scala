package graft.classify

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** C1–C4 cascade semantics: rule ordering, case folding, retry. */
class CascadesSpec extends AnyFunSuite with SparkSpec {

  private def classify(texts: String*): Seq[String] = {
    import spark.implicits._
    texts.toDF("text").select(Cascades.decision(col("text"))).as[String].collect().toSeq
  }

  test("rule order is semantic: allowed beats dismissed when both present") {
    // "appeal is allowed" (rule 1, won) is tested before
    // "appeal dismissed" (rule 4, lost) — reference search_v2.py:179 vs :190
    assert(classify("the appeal dismissed earlier; now the appeal is allowed")
      == Seq("appellant_won"))
  }

  test("each cascade family classifies") {
    assert(classify(
      "The Appeal Is Allowed",              // case-insensitive via lower()
      "impugned order is set-aside",
      "remand to the commissioner",
      "we hereby dismiss the appeal",
      "judgment affirmed",
      "the order is upheld",
      "refund claim is accepted",
      "relief is granted",
      "nothing conclusive here") == Seq(
      "appellant_won", "appellant_won", "appellant_won", "appellant_lost",
      "appellant_lost", "appellant_lost", "appellant_won", "appellant_won",
      "invalid"))
  }

  test("whitespace flexibility: patterns use \\s+ across newlines") {
    assert(classify("the appeal\n   is\t allowed") == Seq("appellant_won"))
  }

  test("document type ordering probe: tribunal wins over high court") {
    import spark.implicits._
    val out = Seq("in the high court cestat matter").toDF("text")
      .select(Cascades.docType(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("appellate_tribunal"))
  }

  test("C4 retry flips invalid when metadata matches; keeps non-invalid") {
    import spark.implicits._
    val df = Seq(
      ("no outcome here", "metadata: appeal allowed"),   // invalid → retry → won
      ("no outcome here", ""),                           // invalid, no metadata → invalid
      ("appeal dismissed", "metadata: appeal allowed")   // lost stays lost (no retry)
    ).toDF("text", "meta")
    val out = df.select(Cascades.decisionWithRetry(col("text"), col("meta")))
      .as[String].collect().toSeq
    assert(out == Seq("appellant_won", "invalid", "appellant_lost"))
  }

  // ---- F8 fallback configurations (embed-v2 vs search-v2 asymmetry) ---

  /** Deterministic stand-in for the GPT-4o call: decides from the
    * conclusion text like the model would, including one answer
    * OUTSIDE the label enum to exercise the response validation.
    */
  private object RuleFallback extends DecisionFallback {
    def decide(conclusion: org.apache.spark.sql.Column,
               docContext: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions._
      // "unfavorable" first — it contains "favorable" as a substring
      when(conclusion.contains("unfavorable outcome"), lit(DecisionRules.Lost))
        .when(conclusion.contains("favorable outcome"), lit(DecisionRules.Won))
        .when(conclusion.contains("gibberish"), lit("not_a_label"))
        .otherwise(lit(DecisionRules.Invalid))
    }
  }

  test("search-v2 configuration (NoFallback): unmatched text stays invalid") {
    import spark.implicits._
    val out = Seq("favorable outcome but no rule phrase").toDF("text")
      .select(Cascades.decisionWithFallback(col("text"), NoFallback))
      .as[String].collect().toSeq
    assert(out == Seq("invalid"))
  }

  test("embed-v2 configuration: fallback decides only when the cascade misses") {
    import spark.implicits._
    val out = Seq(
      "favorable outcome but no rule phrase",    // cascade miss → fallback → won
      "unfavorable outcome described herein",    // cascade miss → fallback → lost
      "appeal dismissed; favorable outcome",     // cascade hit wins; fallback never consulted
      "nothing conclusive"                       // both miss → invalid
    ).toDF("text")
      .select(Cascades.decisionWithFallback(col("text"), RuleFallback))
      .as[String].collect().toSeq
    assert(out == Seq("appellant_won", "appellant_lost", "appellant_lost", "invalid"))
  }

  test("out-of-enum fallback answers are coerced to invalid (emb_v2:295-297)") {
    import spark.implicits._
    val out = Seq("gibberish response trigger").toDF("text")
      .select(Cascades.decisionWithFallback(col("text"), RuleFallback))
      .as[String].collect().toSeq
    assert(out == Seq("invalid"))
  }

  test("C4 retry composes with the fallback configuration") {
    import spark.implicits._
    // cascade misses on text AND on meta-enriched text; the fallback
    // sees the enriched conclusion on retry and decides
    val df = Seq(("no outcome here", "annex: favorable outcome")).toDF("text", "meta")
    val regexOnly = df.select(Cascades.decisionWithRetry(col("text"), col("meta")))
      .as[String].collect().toSeq
    val withAi = df.select(
        Cascades.decisionWithRetry(col("text"), col("meta"), RuleFallback))
      .as[String].collect().toSeq
    assert(regexOnly == Seq("invalid"))
    assert(withAi == Seq("appellant_won"))
  }
}
