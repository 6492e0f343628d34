package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BloomScreenSpec extends AnyFunSuite with SparkSpec {

  private def corpus() = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),   // probe
      (1L, "pack my box with five dozen liquor jugs"),       // probe
      (2L, "the quick brown fox runs far away now"),          // shares 3-grams with 0
      (3L, "pack my box with nothing else at all"),           // shares 3-grams with 1
      (4L, "completely unrelated content about spark plans"), // clean
      (5L, "the quick brown fox jumps over the lazy dog")     // exact copy of probe 0
    ).toDF("doc_id", "text")
  }

  test("bloom route is row-identical to the exact broadcast route") {
    val docs = corpus()
    val probeIds = Seq(0L, 1L)
    val exact = TextAnalysis.contaminationHits(docs, col("doc_id"), col("text"), probeIds)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = TextAnalysis.contaminationHitsBloom(docs, col("doc_id"), col("text"), probeIds)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty, "fixture must produce contamination hits")
    assert(bloom == exact)
    // sanity on the fixture itself: the exact copy matches every probe
    // shingle; the clean doc never appears
    val m = exact.toMap
    assert(m.contains(5L) && !m.contains(4L))
  }

  test("exactness holds at an adversarially high false-positive rate") {
    // fpp close to 1 makes the prefilter pass nearly everything — the
    // verify join must still strip every false positive
    val docs = corpus()
    val probeIds = Seq(0L, 1L)
    val exact = TextAnalysis.contaminationHits(docs, col("doc_id"), col("text"), probeIds)
      .orderBy("doc_id").collect().toSeq
    val loose = TextAnalysis.contaminationHitsBloom(docs, col("doc_id"), col("text"),
        probeIds, fpp = 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(loose == exact)
  }

  test("kernel probe has no false negatives and stays codegen-compatible") {
    import spark.implicits._
    val filter = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0L until 50L).foreach(filter.putLong)
    val probed = (0L until 100L).toDF("h")
      .select(col("h"), BloomKernel.mightContainLong(col("h"), filter).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every inserted value must hit; non-inserted values may false-positive
    (0L until 50L).foreach(h => assert(probed(h), s"false negative at $h"))
  }
}
