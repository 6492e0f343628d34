package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {

  test("bm25 matches the formula computed directly; non-matching docs drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash"),
      (2L, "sort merge"),
      (3L, "hash")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, col("doc_id"), col("text"), Seq("hash"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // N=3, df=2, avgdl=2.0; idf = ln(1 + 1.5/2.5)
    val idf = math.log(1.0 + 1.5 / 2.5)
    def score(tf: Double, dl: Double) =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map(1L -> score(2, 3), 3L -> score(1, 1)), s"got $out")
    // length normalization at work: the short exact hit outranks the
    // longer doc despite its lower raw tf
    assert(out(3L) > out(1L))
  }

  test("TermStats kernel equals the split/filter column form, including edge tokens") {
    import spark.implicits._
    val terms = Seq("hash", "join", "véc")
    val docs = Seq(
      "hash join hash vector",
      "",                              // → [""] (dl 1)
      "   ",                           // trim → "" (dl 1)
      "\thash\t",                      // leading+trailing empty tokens (dl 3)
      "HASH Join hash",                // lowercasing
      "a  b\n\nc",                     // multi-separator runs
      "VÉC véc unicode"                // non-ASCII lowercasing
    ).toDF("text")
    val toks = split(lower(trim(col("text"))), "\\s+")
    val expectedCols = Seq(size(toks).cast("long").as("dl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        size(filter(toks, x => x === t)).cast("long").as(s"tf_$i")
      }
    val expected = docs.select(array(expectedCols: _*)).as[Seq[Long]].collect()
    val kernel = docs.select(TextKernels.termStats(col("text"), terms))
      .as[Seq[Long]].collect()
    assert(kernel.toSeq == expected.toSeq)
  }

  test("DocStats fused forms equal the HOF/regex column forms on adversarial text") {
    import spark.implicits._
    val docs = Seq(
      "the cat and the hat is A thing of beauty",
      "",                               // empty → ntok 0
      "   ",                            // trim → empty
      "\tder und die\t",                // de markers + edge tokens
      "El los que por con 42 !!",       // es markers (case), digits, punct
      "a  b\n\nc\u000Bd",           // separator runs incl VT
      "naïve café — cost: €5.99",       // multi-byte chars count as punct
      "K KELVIN sign lowercases to k",  // U+212A: lowercase maps to ASCII k
      "wo ni ta men hao wo ni",         // zh beats en
      "and und and und"                 // tie → earlier language wins
    ).toDF("text")
    val t = col("text")
    val d = TextAnalysis.docStats(t)
    val len = length(t)
    val fused = docs.select(
      TextAnalysis.nTokensWsF(d), TextAnalysis.avgWordLenF(d),
      TextAnalysis.punctRatioF(d, len), TextAnalysis.alphaRatioF(d, len),
      TextAnalysis.stopwordRatioF(d), TextAnalysis.qualityScoreF(d, len),
      TextAnalysis.langIdF(d)).collect().map(_.toSeq).toSeq
    val cols = docs.select(
      TextAnalysis.nTokensWs(t), TextAnalysis.avgWordLen(t),
      TextAnalysis.punctRatio(t), TextAnalysis.alphaRatio(t),
      TextAnalysis.stopwordRatio(t), TextAnalysis.qualityScore(t),
      TextAnalysis.langId(t)).collect().map(_.toSeq).toSeq
    assert(fused == cols)
  }

  test("bm25Join agrees with the fixed-terms bm25 for a single query") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash scan"),
      (2L, "sort merge join"),
      (3L, "hash"),
      (4L, "unrelated words entirely")
    ).toDF("doc_id", "text")
    // terms sorted so both routes fold contributions in the same order
    val terms = Seq("hash", "join")
    val fixed = TextAnalysis.bm25(docs, col("doc_id"), col("text"), terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val joined = TextAnalysis.bm25Join(docs, col("doc_id"), col("text"),
        Seq((7L, terms)).toDF("query_id", "terms"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(joined.forall(_._1 == 7L))
    assert(joined.map(x => x._2 -> x._3).toMap == fixed,
      s"join ${joined.toSeq} vs fixed $fixed")
    // ranks descend by score
    val byRank = joined.sortBy(_._4).map(_._3).toSeq
    assert(byRank == byRank.sorted.reverse, s"ranks not score-descending: $byRank")
  }

  test("indexed bm25 serves identical results with no postings-side exchange") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash scan"),
      (2L, "sort merge join"),
      (3L, "hash vector"),
      (4L, "scan scan scan")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, Seq("hash", "join")), (2L, Seq("scan")))
      .toDF("query_id", "terms")
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString
    try {
      TextAnalysis.buildBm25Index(docs, col("doc_id"), col("text"),
        "bm25_test_idx", dir, numBuckets = 4)
      val direct = TextAnalysis.bm25Join(docs, col("doc_id"), col("text"),
          queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val served = TextAnalysis.bm25JoinIndexed(spark, "bm25_test_idx",
        queries, k = 5)
      val got = served.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
      assert(got == direct, s"indexed $got != direct $direct")
      // the bucketed layout must keep the postings scan exchange-free:
      // the only hash exchange left is the final per-query grouping
      val plan = served.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(token"),
        s"postings side re-shuffled on token:\n$plan")
    } finally {
      graft.sources.Bucketing.dropTable(spark, "bm25_test_idx")
      graft.sources.Bucketing.dropTable(spark, "bm25_test_idx_stats")
    }
  }

  test("bm25 multi-term scores are additive over terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join"),
      (2L, "hash hash"),
      (3L, "other words here")
    ).toDF("doc_id", "text")
    def scores(terms: Seq[String]) =
      TextAnalysis.bm25(docs, col("doc_id"), col("text"), terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val both = scores(Seq("hash", "join"))
    val hashOnly = scores(Seq("hash"))
    val joinOnly = scores(Seq("join"))
    // doc 1 matches both terms: its combined score is the sum of its
    // single-term scores (up to the final rounding step)
    assert(math.abs(both(1L) - (hashOnly(1L) + joinOnly(1L))) < 2e-4,
      s"${both(1L)} vs ${hashOnly(1L)} + ${joinOnly(1L)}")
    assert(!both.contains(3L))
  }

  // ------------------------------------------------------------------
  // Behavioral pins for scrub / repetitionStats / contaminationHits —
  // exact-output unit assertions relocated from the pre-repurpose
  // CurationSpec (cross-engine oracle gates cannot catch a drift
  // authored identically into both the Spark and DuckDB twins).
  // ------------------------------------------------------------------

  private def scrubOne(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("t").select(TextAnalysis.scrub(col("t"))).as[String]
      .collect().head
  }

  test("scrub redacts emails, urls, and long digit runs") {
    assert(scrubOne("mail a.b+c@d-e.org now") == "mail <EMAIL> now")
    assert(scrubOne("go to https://x.io/p?q=1 ok") == "go to <URL> ok")
    assert(scrubOne("ref 123456789 end") == "ref <NUM> end")
  }

  test("scrub ordering: url digits vanish with the url, short runs stay") {
    // digits inside a URL are part of the URL redaction, never <NUM>
    assert(scrubOne("see http://a.b/97654321x") == "see <URL>")
    // 5 digits is below the redaction floor
    assert(scrubOne("pin 12345 kept") == "pin 12345 kept")
    // email before url pass: the email host is not half-eaten
    assert(scrubOne("both z9@q.co and https://q.co/z 112233445566") ==
      "both <EMAIL> and <URL> <NUM>")
  }

  test("repetition stats: ratios on a crafted document") {
    import spark.implicits._
    val r = Seq("a b a b a c").toDF("t")
      .select(TextAnalysis.repetitionStats(col("t")).as("r"))
      .select("r.n_tokens", "r.n_distinct", "r.distinct_ratio", "r.top_share")
      .collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.5)      // 3 distinct / 6 tokens
    assert(r.getDouble(3) == 0.5)      // "a" appears 3/6
  }

  test("contamination screen flags shared 3-grams, excludes probes") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),          // probe
      (1L, "zeta eta theta iota"),             // probe
      (10L, "x alpha beta gamma y"),           // shares "alpha beta gamma"
      (11L, "beta gamma delta tail plus"),     // shares "beta gamma delta"
      (12L, "nothing in common here at all"))  // clean
      .toDF("doc_id", "text")
    val hits = TextAnalysis.contaminationHits(docs, col("doc_id"), col("text"),
        probeIds = Seq(0L, 1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(10L -> 1L, 11L -> 1L))
  }

  test("tfidf keywords: distinctive terms beat ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common apple apple apple"),
      (2L, "common banana banana"),
      (3L, "common cherry")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopK(docs, col("doc_id"), col("text"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "common" has df = 3 → idf = ln(4/4) = 0; the per-doc term wins
    assert(top == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
  }

  test("tfidf rank is dense per document with deterministic tie-break") {
    import spark.implicits._
    val docs = Seq(
      (1L, "zz aa zz aa mid"),
      (2L, "mid other")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfTopK(docs, col("doc_id"), col("text"), k = 3)
      .where(col("id") === 1L).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getInt(3)))
    // aa and zz tie on (tf=2, df=1) — token ascending breaks the tie
    assert(rows.take(2).toSeq == Seq(("aa", 1), ("zz", 2)))
  }

  test("char entropy: uniform text maxes, repeated char floors at zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd"),      // 4 distinct chars, uniform → ln 4
      (2L, "aaaa"),      // degenerate → 0
      (3L, "aabb")).toDF("doc_id", "text")
    val e = TextAnalysis.charEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(e(1L) == ((4L, math.rint(math.log(4.0) * 1e4) / 1e4)))
    assert(e(2L) == ((4L, 0.0)))
    assert(e(3L) == ((4L, math.rint(math.log(2.0) * 1e4) / 1e4)))
  }

  test("pmi collocations: a glued pair outranks independent co-occurrence") {
    import spark.implicits._
    // "new york" always adjacent (perfect association); "the" spreads
    // over three right tokens, diluting "the cat"'s association
    val docs = Seq(
      (1L, "new york new york new york"),
      (2L, "the cat the dog the pig the cat")).toDF("doc_id", "text")
    val rows = TextAnalysis.pmiCollocations(docs, col("text"),
        minCount = 2, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    val m = rows.toMap
    assert(m(("new", "york")) > m(("the", "cat")),
      s"glued pair must outrank shared-token pair: $rows")
    // every emitted pair meets the count floor
    assert(rows.nonEmpty)
  }

  test("pmi collocations equals the hand formula on a fixed corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c a b")).toDF("doc_id", "text")
    // bigrams: ab, ba, ab, bc, ca, ab → c12(a,b)=3, l1(a)=3, r2(b)=3, N=6
    val rows = TextAnalysis.pmiCollocations(docs, col("text"),
        minCount = 3, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val expected = math.rint(math.log(3.0 * 6.0 / (3.0 * 3.0)) * 1e4) / 1e4
    assert(rows.toSeq == Seq(("a", "b", 3L, expected)))
  }

  test("tfidf top-k is an aggregate, not a global window") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.tfidfTopK(docs, col("doc_id"), col("text"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window-free top-k contract:\n$plan")
  }

  test("contamination plan broadcasts the probe side") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d"), (5L, "b c d e")).toDF("doc_id", "text")
    val plan = TextAnalysis.contaminationHits(docs, col("doc_id"), col("text"),
      probeIds = Seq(0L)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
