package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Byte-level (GPT-2 style) BPE arm: hex-byte symbols, GPT-2 regex
  * pre-tokens, case sensitivity, and multibyte UTF-8 decomposition.
  */
class BpeBytesSpec extends AnyFunSuite with SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  private def merges(df: org.apache.spark.sql.DataFrame, steps: Int) =
    Bpe.trainMergesBytes(df, col("text"), steps).orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("hand-computed byte merges: 'aa aa ab' trains (61,61) first") {
    // pre-tokens of "aa aa ab": "aa", " aa", " ab" → byte pairs:
    // (61,61) ×2 ("aa", " aa"), (20,61) ×2 — tie → lexicographic
    // "20" < "61" wins. Round 2: " aa" is now [2061][61], so the
    // candidates all count 1 and ("2061","61") < ("61","61") wins.
    val out = merges(docs("aa aa ab"), 2)
    assert(out(0) == (1, "20", "61", "2061", 2L))
    assert(out(1) == (2, "2061", "61", "206161", 1L))
  }

  test("multibyte UTF-8 decomposes to one symbol per byte") {
    // é = C3 A9; corpus of repeated é makes (C3,A9) the top pair
    val out = merges(docs("é é é x"), 1)
    assert(out(0) == (1, "C3", "A9", "C3A9", 3L))
    // before any merge each é costs 2 tokens; after the merge, 1
    val none = Bpe.encodeTokenCountsBytes(docs("ééé"), col("id"),
      col("text"), Nil).head()
    assert(none.getInt(1) == 6)   // n_bytes: 3 × 2
    assert(none.getLong(2) == 6L) // 6 byte tokens unmerged
    val one = Bpe.encodeTokenCountsBytes(docs("ééé"), col("id"),
      col("text"), Seq(("C3", "A9"))).head()
    assert(one.getLong(2) == 3L)  // one token per é after the merge
  }

  test("pre-tokenization is case-sensitive and keeps space prefixes") {
    // "Aa aa": pre-tokens "Aa" and " aa" — distinct histograms, so a
    // merge trained on lowercase bytes never fires inside "Aa"
    val out = Bpe.encodeTokenCountsBytes(docs("Aa aa"), col("id"),
      col("text"), Seq(("61", "61"))).head()
    // "Aa" → [41][61] (no merge), " aa" → [20][6161] → 4 tokens
    assert(out.getLong(2) == 4L)
  }

  test("scalable byte route equals the expression route, deep merges included") {
    import org.apache.spark.sql.functions.col
    val corpus = docs("the cat sat on the mat", "don't stop the Müller café",
      "aa aa ab", "émigré émigré", "")
    val m = Bpe.trainMergesBytes(corpus, col("text"), steps = 12)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val expr = Bpe.encodeTokenCountsBytes(corpus, col("id"), col("text"), m)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val scal = Bpe.encodeTokenCountsBytesScalable(corpus, col("id"), col("text"), m)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(scal == expr)
  }

  test("contractions split as their own pre-tokens") {
    // "don't" → pre-tokens "don" + "'t" — the GPT-2 contraction rule;
    // with no merges the token count is just the byte count
    val out = Bpe.encodeTokenCountsBytes(docs("don't"), col("id"),
      col("text"), Nil).head()
    assert(out.getInt(1) == 5)
    assert(out.getLong(2) == 5L)
    // a merge spanning the n|' boundary can never fire: the pair sits
    // in different pre-tokens
    val merged = Bpe.encodeTokenCountsBytes(docs("don't"), col("id"),
      col("text"), Seq(("6E", "27"))).head()
    assert(merged.getLong(2) == 5L)
  }
}
