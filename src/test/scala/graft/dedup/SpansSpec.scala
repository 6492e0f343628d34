package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Duplicated-substring spans: maximal-run semantics on planted
  * corpora — cross-doc duplication, intra-doc repetition, seed
  * merging, and the below-threshold negative.
  */
class SpansSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(df: org.apache.spark.sql.DataFrame, n: Int) =
    Spans.duplicatedSpans(df, col("doc_id"), col("text"), n)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("a shared run reports the full maximal span in both documents") {
    // docs 1 and 2 share tokens "s1..s5" (5 tokens) at different
    // offsets; with minTokens=3 the merged span covers all 5
    val df = docs(
      (1L, "a b s1 s2 s3 s4 s5 c d"),
      (2L, "x s1 s2 s3 s4 s5 y z w q"))
    val got = spans(df, 3)
    assert(got == Seq((1L, 3L, 7L), (2L, 2L, 6L)), s"$got")
  }

  test("runs shorter than minTokens are not reported") {
    val df = docs(
      (1L, "a b s1 s2 c d e f"),
      (2L, "x s1 s2 y z w p q"))
    assert(spans(df, 3).isEmpty)
  }

  test("intra-document repetition is duplication too") {
    // "r1 r2 r3" occurs twice inside one doc: two disjoint spans
    val df = docs((1L, "r1 r2 r3 a b c d r1 r2 r3 e f"))
    val got = spans(df, 3)
    assert(got == Seq((1L, 1L, 3L), (1L, 8L, 10L)), s"$got")
  }

  test("overlapping and adjacent seeds merge into one span") {
    // two docs share a 8-token run; every 3-seed inside it overlaps
    // the next, so exactly ONE span of length 8 comes out per doc
    val shared = (1 to 8).map(i => s"t$i").mkString(" ")
    val df = docs((1L, s"$shared a b"), (2L, s"c d $shared"))
    val got = Spans.duplicatedSpans(df, col("doc_id"), col("text"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq.sorted
    assert(got == Seq((1L, 8L), (2L, 8L)), s"$got")
  }

  test("documents shorter than minTokens produce no seeds and no error") {
    val df = docs((1L, "a b"), (2L, "a b"))
    assert(spans(df, 3).isEmpty)
  }

  test("hashed-gram tier returns exactly the string-keyed spans") {
    val df = docs(
      (1L, "a b s1 s2 s3 s4 s5 c d"),
      (2L, "x s1 s2 s3 s4 s5 y z w q"),
      (3L, "r1 r2 r3 a b c d r1 r2 r3 e f"),
      (4L, "u v w only once here nothing repeats at all"))
    val str = Spans.duplicatedSpans(df, col("doc_id"), col("text"), 3)
      .orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq
    val hashed = Spans.duplicatedSpans(df, col("doc_id"), col("text"), 3,
      hashGrams = true)
      .orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq
    assert(hashed == str, s"hashed=$hashed str=$str")
    val clipStr = Spans.clipSpans(df, col("doc_id"), col("text"), 3)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val clipHashed = Spans.clipSpans(df, col("doc_id"), col("text"), 3,
      hashGrams = true)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(clipHashed == clipStr, s"hashed=$clipHashed str=$clipStr")
  }

  private def clipped(df: org.apache.spark.sql.DataFrame, n: Int) =
    Spans.clipSpans(df, col("doc_id"), col("text"), n)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("clipSpans keeps the first occurrence and excises the later one") {
    val df = docs(
      (1L, "a b s1 s2 s3 s4 s5 c d"),
      (2L, "x s1 s2 s3 s4 s5 y z w q"))
    assert(clipped(df, 3) == Seq(
      (1L, "a b s1 s2 s3 s4 s5 c d", 0L),
      (2L, "x y z w q", 5L)))
  }

  test("clipSpans intra-document: second repetition removed, first kept") {
    val df = docs((1L, "r1 r2 r3 a b c d r1 r2 r3 e f"))
    assert(clipped(df, 3) == Seq((1L, "r1 r2 r3 a b c d e f", 3L)))
  }

  test("clipSpans: a fully-duplicated later document clips to empty text") {
    val df = docs((1L, "a b c d"), (2L, "a b c d"))
    assert(clipped(df, 3) == Seq((1L, "a b c d", 0L), (2L, "", 4L)))
  }

  test("clipSpans passes unaffected and short documents through verbatim") {
    val df = docs((1L, "u v w x y z"), (2L, "a b"), (3L, "a b"))
    assert(clipped(df, 3) == Seq(
      (1L, "u v w x y z", 0L), (2L, "a b", 0L), (3L, "a b", 0L)))
  }

  test("clipSpans protects winning seeds when duplicated regions interleave") {
    // gram "a b" wins in doc0 (doc1's is a loser); gram "b c" wins in
    // doc1 (doc2's is a loser). Doc1's loser interval [1,2] overlaps
    // its winning "b c" seed [2,3]: token 2 must SURVIVE or the region
    // "b c" would be deleted from every document in the corpus
    val df = docs((0L, "a b"), (1L, "a b c"), (2L, "b c"))
    assert(clipped(df, 2) == Seq(
      (0L, "a b", 0L), (1L, "b c", 1L), (2L, "", 2L)))
  }

  test("clipSpans passes untouched documents through with their ORIGINAL whitespace") {
    val messy = "u\tv  w\nx  y z "
    val df = docs((1L, messy), (2L, "s1 s2 s3 a"), (3L, "b s1 s2 s3"))
    val got = clipped(df, 3)
    assert(got.head == ((1L, messy, 0L)),
      s"unaffected doc must keep tabs/newlines/trailing space: ${got.head}")
    assert(got.drop(1) == Seq((2L, "s1 s2 s3 a", 0L), (3L, "b", 3L)))
  }

  test("a doc whose loser intervals are FULLY winner-protected passes through verbatim") {
    // ADVICE r11: doc 2's only loser seed ("x y", first seen in doc 1)
    // sits entirely under winner intervals of grams whose first
    // occurrence IS doc 2 (doc 3 duplicates it) — nothing is actually
    // removed, so doc 2 must keep its ORIGINAL double-space whitespace,
    // not a space-rejoined copy keyed on interval presence
    val messy = "p q  x y r s"
    val df = docs((1L, "x y"), (2L, messy), (3L, "p q x y r s"))
    Seq(false, true).foreach { hash =>
      val got = Spans.clipSpans(df, col("doc_id"), col("text"),
          minTokens = 2, hashGrams = hash)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got.head == ((1L, "x y", 0L)), s"hash=$hash: ${got.head}")
      assert(got(1) == ((2L, messy, 0L)),
        s"hash=$hash: fully-protected doc must keep original whitespace: ${got(1)}")
      assert(got(2)._3 > 0L, s"hash=$hash: doc 3 must actually clip: ${got(2)}")
    }
  }

  test("clipAgainst removes benchmark-covered runs, keeps everything else verbatim") {
    val messy = "clean  doc\twith odd   spacing "
    val bench = docs((100L, "eval q1 q2 q3 answer"))
    val train = docs(
      (1L, "intro text q1 q2 q3 more text here"), // quotes a bench run
      (2L, messy), // untouched: ORIGINAL whitespace must survive
      (3L, "q1 q2 q3")) // entirely benchmark content
    def run(hash: Boolean) =
      Spans.clipAgainst(train, col("doc_id"), col("text"),
          bench, col("text"), minTokens = 3, hashGrams = hash)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = Seq(
      (1L, "intro text more text here", 3L),
      (2L, messy, 0L),
      (3L, "", 3L))
    assert(run(hash = false) == want)
    assert(run(hash = true) == want, "hashed tier must equal the string route")
  }

  test("clipSpans three-way duplication keeps exactly one occurrence") {
    val df = docs(
      (1L, "p q s1 s2 s3 s4"),
      (2L, "s1 s2 s3 s4 m n"),
      (3L, "k s1 s2 s3 s4"))
    assert(clipped(df, 3) == Seq(
      (1L, "p q s1 s2 s3 s4", 0L),
      (2L, "m n", 4L),
      (3L, "k", 4L)))
  }
}
