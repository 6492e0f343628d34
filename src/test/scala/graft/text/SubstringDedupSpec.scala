package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Exact-substring dedup spans (Lee et al. 2022): duplicate 5-gram
  * positions keep their globally-first occurrence and merge into
  * maximal per-document removal spans.
  */
class SubstringDedupSpec extends AnyFunSuite with SparkSpec {

  // P = a 6-token phrase; doc 1 holds its first occurrence, docs 2 and
  // 3 repeat it (doc 3 twice, with unique filler between)
  private val P = "x1 x2 x3 x4 x5 x6"
  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, s"u1 u2 $P v1 v2"),
      (2L, s"w1 $P w2"),
      (3L, s"$P y1 y2 y3 y4 y5 $P")
    ).toDF("doc_id", "text")
  }

  private def spans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Int, Int)] =
    TextAnalysis.substringDedupSpans(df, col("doc_id"), col("text"), n = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("duplicate phrases merge into maximal spans; first occurrence survives") {
    // doc 2: P occupies tokens 2-7; its two interior 5-grams (idx 2, 3)
    // are duplicates of doc 1's (idx 3, 4) and merge to one span [2,7].
    // doc 3: both copies of P are duplicates (doc 1 is globally first) —
    // two spans [1,6] and [12,17]; the filler's boundary-crossing
    // 5-grams are unique and leave no marks. doc 1 contributes nothing.
    assert(spans(fixture) == Seq(
      (2L, 2, 7, 6),
      (3L, 1, 6, 6),
      (3L, 12, 17, 6)))
  }

  test("within-document repetition alone is also caught") {
    import spark.implicits._
    // one doc, same phrase twice: second copy's grams are non-first
    val df = Seq((7L, s"$P z1 z2 z3 z4 z5 $P")).toDF("doc_id", "text")
    assert(spans(df) == Seq((7L, 12, 17, 6)))
  }

  test("documents shorter than n tokens or without duplicates emit nothing") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "p q r s t u v w")).toDF("doc_id", "text")
    assert(spans(df).isEmpty)
  }

  test("span list is invariant to input partitioning") {
    assert(spans(fixture.repartition(7)) == spans(fixture.coalesce(1)))
  }

  test("apply removes exactly the spanned tokens, keeping order") {
    val out = TextAnalysis.substringDedupApply(fixture, col("doc_id"),
        col("text"), n = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1).toSeq
    // doc 1 is untouched; doc 2 loses P (tokens 2-7); doc 3 loses both
    // copies (1-6 and 12-17), keeping only the filler
    assert(out == Seq(
      (1L, 10, 0, "u1 u2 x1 x2 x3 x4 x5 x6 v1 v2"),
      (2L, 8, 6, "w1 w2"),
      (3L, 17, 12, "y1 y2 y3 y4 y5")))
  }

  test("apply on an empty or span-free doc is the identity") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "p q r s t")).toDF("doc_id", "text")
    val out = TextAnalysis.substringDedupApply(df, col("doc_id"), col("text"), n = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq((1L, 0, 0, ""), (2L, 5, 0, "p q r s t")))
  }

  test("sliding windows step by the stride and reach the tail") {
    import spark.implicits._
    // 10 tokens, window 5, stride 3 → starts 1, 4, 7; last runs short
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val out = TextAnalysis.slidingChunks(df, col("doc_id"), col("text"),
        window = 5, stride = 3)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq((1, 1, 5), (2, 4, 5), (3, 7, 4)))
  }

  test("short docs yield one window; empty docs yield none") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.slidingChunks(df, col("doc_id"), col("text"),
      window = 5, stride = 3)
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3))).toSeq
      == Seq((1L, 1, 2)))
  }
}
