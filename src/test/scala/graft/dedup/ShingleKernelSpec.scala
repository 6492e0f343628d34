package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ShingleKernelSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short text"),
      (3L, "one"),
      (4L, "a a a a a"), // heavy duplication → distinct collapses
      (5L, "unicode tökens über ångström mixed in ascii run")
    ).toDF("id", "text")
  }

  test("shingleHashes: sorted, distinct, same cardinality as string shingles") {
    val rows = docs.select(
      col("id"),
      Dedup.shingleHashes(col("text")).as("hashed"),
      array_distinct(Dedup.shingles(col("text"))).as("strs"))
      .collect()
    rows.foreach { r =>
      val hashed = r.getAs[collection.Seq[Long]]("hashed")
      val strs = r.getAs[collection.Seq[String]]("strs")
      assert(hashed == hashed.sorted, s"id=${r.getLong(0)} not sorted")
      assert(hashed.distinct == hashed, s"id=${r.getLong(0)} not distinct")
      assert(hashed.size == strs.size,
        s"id=${r.getLong(0)} hashed=${hashed.size} strs=${strs.size}")
    }
  }

  test("signatureFromHashes(shingleHashes) is bit-identical to the string-path signature") {
    val rows = docs.select(
      Dedup.minhashSignatureFromHashes(Dedup.shingleHashes(col("text"))).as("fromHashes"),
      Dedup.minhashSignature(array_distinct(Dedup.shingles(col("text")))).as("fromStrings"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[collection.Seq[Long]]("fromHashes") == r.getAs[collection.Seq[Long]]("fromStrings"))
    }
  }

  test("sortedIntersectCount matches array_intersect cardinality") {
    import spark.implicits._
    val pairs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)), // overlap 2
      (Seq(1L, 2L), Seq(3L, 4L)),                  // disjoint
      (Seq(7L), Seq(7L)),                          // identical singleton
      (Seq.empty[Long], Seq(1L))                   // empty side
    ).toDF("a", "b")
    val out = pairs.select(
      ShingleKernel.sortedIntersectCount(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("jaccardSorted equals string-shingle jaccard on real text") {
    val out = docs.as("l").crossJoin(docs.as("r"))
      .where(col("l.id") < col("r.id"))
      .select(
        Dedup.jaccardSorted(
          Dedup.shingleHashes(col("l.text")),
          Dedup.shingleHashes(col("r.text"))).as("hashed"),
        Dedup.jaccard(
          Dedup.shingles(col("l.text")),
          Dedup.shingles(col("r.text"))).as("strs"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("bandHash64: equal signatures share all bands, different signatures differ") {
    import spark.implicits._
    val sigs = Seq(
      (Seq.range(0L, 64L), Seq.range(0L, 64L)),
      (Seq.range(0L, 64L), Seq.range(1L, 65L))
    ).toDF("s1", "s2")
    val out = sigs.select(
      ShingleKernel.bandHash64(col("s1"), Dedup.NumBands).as("b1"),
      ShingleKernel.bandHash64(col("s2"), Dedup.NumBands).as("b2"))
      .collect()
    assert(out(0).getAs[collection.Seq[Long]]("b1") == out(0).getAs[collection.Seq[Long]]("b2"))
    assert(out(1).getAs[collection.Seq[Long]]("b1") != out(1).getAs[collection.Seq[Long]]("b2"))
    // band keys embed the band index — distinct within one signature
    val keys = out(0).getAs[collection.Seq[Long]]("b1")
    assert(keys.distinct.size == keys.size)
  }
}
