package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** C4 cleaning rules on hand-built pages: each rule isolated, then the
  * document gate's sentence threshold.
  */
class C4RulesSpec extends AnyFunSuite with SparkSpec {

  private def one(text: String): (Seq[String], Int, Boolean) = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("id", "text")
    val r = df.select(
      TextAnalysis.c4KeptLines(col("text")).as("kept"),
      TextAnalysis.c4SentenceCount(col("text")).as("ns"),
      TextAnalysis.c4Keep(col("text")).as("keep")).collect().head
    (r.getSeq[String](0).toSeq, r.getInt(1), r.getBoolean(2))
  }

  test("line filter: terminal punctuation, word floor, javascript") {
    val page = Seq(
      "a good long sentence here.",   // kept
      "no punctuation at all",        // dropped: no terminal
      "too short.",                   // dropped: 2 words
      "enable javascript to view.",   // dropped: javascript
      "ends with a bang!",            // kept
      "is this a question?",          // kept
      "he said \"quoted words here\"" // kept: closing quote terminal
    ).mkString("\n")
    val (kept, _, _) = one(page)
    assert(kept == Seq(
      "a good long sentence here.",
      "ends with a bang!",
      "is this a question?",
      "he said \"quoted words here\""))
  }

  test("document gate: five cleaned sentences required") {
    val four = "one fine sentence. two fine sentences! third one here? and a fourth."
    assert(!one(four)._3)
    val five = four + "\nalso a fifth sentence."
    assert(one(five)._3)
  }

  test("document gate: lorem ipsum and braces poison the page") {
    val base = "s one ok. s two ok. s three ok. s four ok. s five ok."
    assert(one(base)._3)
    assert(!one(base + "\nsome Lorem Ipsum filler text.")._3)
    // the brace rule scans the ORIGINAL page — even a line the filter
    // drops still poisons it
    assert(!one(base + "\ncode { fragment")._3)
  }

  test("sentence count runs on the CLEANED page") {
    // five terminals overall, but two live on a dropped (javascript)
    // line — the cleaned page has only three sentences
    val page = Seq(
      "first real sentence here. second real one! third real one?",
      "javascript sentences do not count. truly not!").mkString("\n")
    val (_, ns, keep) = one(page)
    assert(ns == 3)
    assert(!keep)
  }
}
