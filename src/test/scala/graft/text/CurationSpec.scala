package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CurationSpec extends AnyFunSuite with SparkSpec {

  private def one(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("t").select(TextAnalysis.scrub(col("t"))).as[String]
      .collect().head
  }

  test("scrub redacts emails, urls, and long digit runs") {
    assert(one("mail a.b+c@d-e.org now") == "mail <EMAIL> now")
    assert(one("go to https://x.io/p?q=1 ok") == "go to <URL> ok")
    assert(one("ref 123456789 end") == "ref <NUM> end")
  }

  test("scrub ordering: url digits vanish with the url, short runs stay") {
    // digits inside a URL are part of the URL redaction, never <NUM>
    assert(one("see http://a.b/97654321x") == "see <URL>")
    // 5 digits is below the redaction floor
    assert(one("pin 12345 kept") == "pin 12345 kept")
    // email before url pass: the email host is not half-eaten
    assert(one("both z9@q.co and https://q.co/z 112233445566") ==
      "both <EMAIL> and <URL> <NUM>")
  }

  test("repetition stats: ratios on a crafted document") {
    import spark.implicits._
    val r = Seq("a b a b a c").toDF("t")
      .select(TextAnalysis.repetitionStats(col("t")).as("r"))
      .select("r.n_tokens", "r.n_distinct", "r.distinct_ratio", "r.top_share")
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.5)      // 3 distinct / 6 tokens
    assert(r.getDouble(3) == 0.5)      // "a" appears 3/6
  }

  test("contamination screen flags shared 3-grams, excludes probes") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),          // probe
      (1L, "zeta eta theta iota"),             // probe
      (10L, "x alpha beta gamma y"),           // shares "alpha beta gamma"
      (11L, "beta gamma delta tail plus"),     // shares "beta gamma delta"
      (12L, "nothing in common here at all"))  // clean
      .toDF("doc_id", "text")
    val hits = TextAnalysis.contaminationHits(docs, col("doc_id"), col("text"),
        probeIds = Seq(0L, 1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(10L -> 1L, 11L -> 1L))
  }

  test("contamination plan broadcasts the probe side") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d"), (5L, "b c d e")).toDF("doc_id", "text")
    val plan = TextAnalysis.contaminationHits(docs, col("doc_id"), col("text"),
      probeIds = Seq(0L)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
