package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LmQualitySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bigramLogPpl: exact scores and tiers on a hand-computed corpus") {
    import spark.implicits._
    // occurrences: d1 (a,b)(b,a)(a,b); d2 (a,b); d3 (x,y); d4 none
    // c12: (a,b)=3 (b,a)=1 (x,y)=1; ctx: a=3 b=1 x=1; V=|{b,a,y}|=3
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "x y"), (4L, "solo")
    ).toDF("doc_id", "text")
    val out = LmQuality.bigramLogPpl(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    // p(b|a) = 4/6 → floor(-ln·1e4) = 4054; p(a|b) = p(y|x) = 2/4 → 6931
    assert(out.keySet == Set(1L, 2L, 3L), "doc 4 has no bigram")
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L && out(3L)._1 == 1L)
    // d1: (4054+6931+4054) div 3 = 5013; d2: 4054; d3: 6931
    assert(out(2L)._2 == 0.4054 && out(1L)._2 == 0.5013 && out(3L)._2 == 0.6931)
    // rank by (logppl, id): d2 < d1 < d3 over n=3 → one per tier
    assert(out(2L)._3 == "head" && out(1L)._3 == "middle" && out(3L)._3 == "tail")
  }

  test("bigramLogPpl: repetitive text scores more predictable than varied") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat the cat sat"),
      (2L, "quantum harbor velvet thunder biscuit meridian octopus lantern")
    ).toDF("doc_id", "text")
    val out = LmQuality.bigramLogPpl(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(2L),
      s"repeated bigrams must be cheaper: ${out(1L)} vs ${out(2L)}")
  }

  test("bigramLogPpl: score invariant to partitioning") {
    val docs = graft.sources.Tables.documents(spark, dir).limit(60)
    def rows(df: org.apache.spark.sql.DataFrame) =
      LmQuality.bigramLogPpl(df, col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getString(3))).sortBy(_._1).toSeq
    assert(rows(docs) == rows(docs.repartition(17)))
  }

  test("dsirLogWeights: target-like docs weigh positive, others negative") {
    import spark.implicits._
    // two disjoint vocabularies; target slice speaks "alpha"
    val docs = (0L until 40L).map { i =>
      val tgt = i < 20
      val text = if (tgt) "alpha beta gamma alpha beta" else "zeta eta theta zeta eta"
      (i, text, tgt)
    }.toDF("doc_id", "text", "is_en")
    val out = LmQuality.dsirLogWeights(docs, col("doc_id"), col("text"),
        isTarget = col("is_en"), buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size == 40)
    (0L until 20L).foreach(i => assert(out(i) > 0, s"target doc $i: ${out(i)}"))
    (20L until 40L).foreach(i => assert(out(i) < 0, s"raw doc $i: ${out(i)}"))
  }

  test("dsirLogWeights: English docs skew positive on the harness table") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val out = LmQuality.dsirLogWeights(docs, col("doc_id"), col("text"),
        isTarget = col("lang") === "en", buckets = 1024)
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
      .groupBy(col("lang") === "en").agg(avg("logweight").as("w"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // absolute level shifts with smoothing; the SEPARATION is the
    // property (resampling by weight prefers the target slice)
    assert(out(true) > out(false) + 1.0,
      s"en avg ${out(true)} must clearly exceed non-en avg ${out(false)}")
  }
}
