package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ParagraphDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], parts: Int = 3) = {
    val df = docs.toDF("doc_id", "text").repartition(parts)
    TextAnalysis.paragraphDedup(df, col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text")))).toMap
  }

  test("corpus-wide repeats keep only the globally-first occurrence") {
    val out = run(Seq(
      1L -> "alpha\n\nbeta\n\ngamma",
      2L -> "beta\n\ndelta",
      3L -> "gamma\n\nbeta\n\nepsilon"))
    assert(out(1L) === ((3L, 3L, "alpha\n\nbeta\n\ngamma")))
    assert(out(2L) === ((2L, 1L, "delta")))
    assert(out(3L) === ((3L, 1L, "epsilon")))
  }

  test("dedup key is whitespace/case normalized; output keeps original text") {
    val out = run(Seq(
      1L -> "Hello   World",
      2L -> "hello world\n\nunique"))
    assert(out(1L) === ((1L, 1L, "Hello   World")))
    assert(out(2L) === ((2L, 1L, "unique")))
  }

  test("within-document repeats also collapse; empty paragraphs don't count") {
    val out = run(Seq(1L -> "same\n\n\n\nsame\n\n  \n\nother"))
    assert(out(1L) === ((3L, 2L, "same\n\nother")))
  }

  test("a document of pure boilerplate comes back empty, not null") {
    val out = run(Seq(
      1L -> "boiler\n\nplate",
      2L -> "boiler\n\nplate"))
    assert(out(2L) === ((2L, 0L, "")))
  }

  test("first occurrence is the global (id, idx) order, not arrival order") {
    // the repeat sits EARLIER in doc 5 than its doc-2 copy's index,
    // but doc 2 has the smaller id → doc 2 keeps it
    val out = run(Seq(
      5L -> "shared\n\nfive",
      2L -> "two-a\n\ntwo-b\n\nshared"), parts = 4)
    assert(out(2L)._3 === "two-a\n\ntwo-b\n\nshared")
    assert(out(5L)._3 === "five")
  }

  test("result is invariant to input partitioning") {
    val docs = (0L until 60L).map(i =>
      i -> s"header\n\nbody $i\n\nfooter ${i % 5}\n\ntail ${i % 7}")
    assert(run(docs, parts = 1) === run(docs, parts = 8))
  }
}
