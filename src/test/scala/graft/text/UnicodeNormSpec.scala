package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UnicodeNormSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val composed   = "caf\u00e9"   // é as one code point
  private val decomposed = "cafe\u0301"  // e + combining acute

  test("composed and decomposed forms converge to identical bytes") {
    val out = Seq((1L, composed), (2L, decomposed)).toDF("id", "s")
      .select(col("id"), md5(UnicodeNorm.nfc(col("s"))).as("m"),
        length(UnicodeNorm.nfc(col("s"))).as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out(0)._2 == out(1)._2, "md5s must match after NFC")
    assert(out.forall(_._3 == 4), "NFC form of café is 4 code points")
    // pre-normalization they are genuinely different byte strings
    assert(composed != decomposed && composed.length == 4
      && decomposed.length == 5)
  }

  test("idempotent, identity on ASCII, null-safe") {
    val out = Seq(Some("plain ascii"), Some(decomposed), None)
      .toDF("s")
      .select(
        UnicodeNorm.nfc(col("s")).as("once"),
        UnicodeNorm.nfc(UnicodeNorm.nfc(col("s"))).as("twice"))
      .collect()
    assert(out(0).getString(0) == "plain ascii")
    assert(out(1).getString(0) == out(1).getString(1), "idempotence")
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("dedup-relevant: fingerprints that hashed apart now collide") {
    val docs = Seq((1L, s"same document $composed"),
      (2L, s"same document $decomposed")).toDF("id", "text")
    val rawFp = docs.select(TextAnalysis.fingerprint(col("text")).as("f"))
      .as[String].collect().toSet
    val nfcFp = docs.select(
        TextAnalysis.fingerprint(UnicodeNorm.nfc(col("text"))).as("f"))
      .as[String].collect().toSet
    assert(rawFp.size == 2, "un-normalized forms hash apart")
    assert(nfcFp.size == 1, "normalized forms dedup together")
  }
}
