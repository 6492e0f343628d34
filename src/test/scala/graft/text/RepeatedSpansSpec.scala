package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RepeatedSpansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int = 3, parts: Int = 3) = {
    val df = docs.toDF("doc_id", "text").repartition(parts)
    TextAnalysis.repeatedSpans(df, col("doc_id"), col("text"), n)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_repeated"),
          r.getAs[Long]("n_nonfirst")))).toMap
  }

  test("shared spans count as repeated everywhere but non-first only after the first") {
    val out = run(Seq(
      1L -> "common header span alpha beta",
      2L -> "common header span gamma delta",
      3L -> "unique words only here now"))
    // doc1: grams (c h s)(h s a)(s a b) — (c h s) repeated, first
    assert(out(1L) === ((3L, 1L, 0L)))
    // doc2: (c h s) repeated AND non-first
    assert(out(2L) === ((3L, 1L, 1L)))
    assert(out(3L) === ((3L, 0L, 0L)))
  }

  test("within-document repetition counts too; first keeps global (id, idx) order") {
    val out = run(Seq(1L -> "a b c x a b c", 2L -> "a b c tail tail2"))
    // doc1 grams: abc bcx cxa xab abc -> "a b c" twice (one non-first)
    assert(out(1L) === ((5L, 2L, 1L)))
    // doc2's "a b c" is repeated and non-first (doc1 idx wins)
    assert(out(2L)._2 >= 1L && out(2L)._3 >= 1L)
  }

  test("documents shorter than n contribute no rows") {
    val out = run(Seq(1L -> "one two", 2L -> "one two three"))
    assert(!out.contains(1L) && out(2L) === ((1L, 0L, 0L)))
  }

  test("result is invariant to input partitioning") {
    val docs = (0L until 40L).map(k =>
      (k, if (k % 4 == 0) "shared run one two three four tail" + k
          else s"unique ${k}a ${k}b ${k}c ${k}d ${k}e"))
    assert(run(docs, n = 3, parts = 1) === run(docs, n = 3, parts = 7))
  }
}
