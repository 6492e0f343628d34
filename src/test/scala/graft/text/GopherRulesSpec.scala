package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.api.Enrich

class GopherRulesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rules(text: String): (Long, Double, Double, Double, Double, Double, Long, Boolean) = {
    val r = Seq(text).toDF("t")
      .select(TextAnalysis.nTokensWs(col("t")).as("wc"),
        TextAnalysis.avgWordLen(col("t")).as("mwl"),
        TextAnalysis.gopherSymbolRatio(col("t")).as("sym"),
        TextAnalysis.gopherBulletFrac(col("t")).as("bul"),
        TextAnalysis.gopherEllipsisFrac(col("t")).as("ell"),
        TextAnalysis.gopherAlphaWordFrac(col("t")).as("alpha"),
        TextAnalysis.gopherReqStopwordCount(col("t")).as("req"),
        TextAnalysis.gopherKeep(col("t")).as("keep"))
      .head()
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getLong(6), r.getBoolean(7))
  }

  private val pad = (0 until 60).map(i => "pad" + i).mkString(" ")
  private val stop = "the be to of and that have with"

  test("a clean long document passes every rule") {
    val (wc, mwl, sym, bul, ell, alpha, req, keep) = rules(s"body text here $stop $pad")
    assert(wc >= 50L && mwl >= 3.0 && mwl <= 10.0)
    assert(sym === 0.0 && bul === 0.0 && ell === 0.0)
    assert(alpha === 1.0 && req === 8L)
    assert(keep)
  }

  test("each rule fails independently") {
    // short doc
    assert(!rules("tiny doc of the and")._8)
    // bulleted lines (every line bulleted -> frac 1.0 > 0.9)
    val (_, _, _, bul, _, _, _, kBul) = rules(s"- first $stop $pad\n- second")
    assert(bul === 1.0 && !kBul)
    // ellipsis-terminated lines (frac 1.0 > 0.3)
    val (_, _, _, _, ell, _, _, kEll) = rules(s"one line $stop $pad...")
    assert(ell === 1.0 && !kEll)
    // symbol ratio just over 0.1 with alpha fraction still >= 0.8
    val symbolDoc = ((0 until 53).map(i => "pad" + i) ++ Seq.fill(7)("#"))
      .mkString(" ") + " " + stop
    val (_, _, sym, _, _, alpha, _, kSym) = rules(symbolDoc)
    assert(sym > 0.1 && alpha >= 0.8 && !kSym)
    // mean word length over 10
    val (_, mwl, _, _, _, _, _, kLong) =
      rules(Seq.fill(60)("abcdefghijklmnop").mkString(" ") + " " + stop)
    assert(mwl > 10.0 && !kLong)
    // alpha-word fraction under 0.8, symbol ratio unaffected
    val numDoc = ((0 until 40).map(i => "pad" + i) ++ Seq.fill(15)("12345"))
      .mkString(" ") + " " + stop
    val (_, _, symN, _, _, alphaN, _, kNum) = rules(numDoc)
    assert(alphaN < 0.8 && symN === 0.0 && !kNum)
    // required stopwords below 2 ("the" alone is not enough)
    val (_, _, _, _, _, _, req, kStop) = rules(s"the quick brown fox $pad")
    assert(req === 1L && !kStop)
  }

  test("bullet and ellipsis fractions are per-line, not per-document") {
    val t = s"- bullet line\nplain $stop $pad\nending line...\nanother plain"
    val (_, _, _, bul, ell, _, _, _) = rules(t)
    assert(bul === 0.25 && ell === 0.25)
  }

  test("empty text fails on word count without dividing by zero") {
    val (wc, _, _, _, _, _, _, keep) = rules("")
    assert(wc === 0L && !keep)
  }

  test("fixture variants hit their targeted rule across a key sweep") {
    val docs = (0L until 16L).map(k => (k, "base words alpha beta gamma " * 12))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.gopherKeep(
          Enrich.gopherContent(col("text"), col("doc_id"))).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 16L).foreach { k =>
      assert(out(k) === (k % 8 === 0L), s"variant ${k % 8} (doc $k)")
    }
  }
}
