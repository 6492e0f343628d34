package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Winnowing fingerprints: the w+k-1 detection guarantee, density
  * bound, containment scoring, and the df-cut boilerplate guard.
  */
class WinnowSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("any shared run of w+k-1 tokens yields a shared fingerprint") {
    // k=3, w=4: guarantee threshold = 6 tokens. Every pair of docs
    // sharing exactly 6 consecutive tokens must share >= 1 fingerprint.
    val run = "g1 g2 g3 g4 g5 g6"
    val df = docs(
      (1L, s"a1 a2 $run a3 a4"),
      (2L, s"b1 $run b2 b3 b4"))
    val fps = Winnow.fingerprints(df, col("doc_id"), col("text"), 3, 4)
    val shared = fps.groupBy("fp").agg(countDistinct("doc_id").as("nd"))
      .where(col("nd") === 2).count()
    assert(shared >= 1)
  }

  test("fingerprint density is well below the k-gram count") {
    val text = (1 to 200).map(i => s"w${i * 7919 % 101}").mkString(" ")
    val df = docs((1L, text))
    val nfp = Winnow.fingerprints(df, col("doc_id"), col("text"), 3, 8)
      .count()
    val ngrams = 200 - 2
    // expected ~2/(w+1) density; allow generous slack either side
    assert(nfp < ngrams / 2, s"nfp=$nfp of $ngrams grams")
    assert(nfp > ngrams / 20, s"nfp=$nfp of $ngrams grams")
  }

  test("a fully contained document scores 1.0 against its container") {
    val core = (1 to 30).map(i => s"c$i").mkString(" ")
    val df = docs(
      (1L, core),
      (2L, s"p1 p2 p3 $core q1 q2 q3"))
    val got = Winnow.winnowPairs(df, col("doc_id"), col("text"),
        k = 3, w = 4, minScore = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(got.length == 1)
    val (a, b, score) = got.head
    assert((a, b) == (1L, 2L))
    assert(score == 1.0, s"score=$score")
  }

  test("the df-cut drops fingerprints shared by too many documents") {
    // every doc carries the same boilerplate run; with maxDf below the
    // corpus size no pair survives on boilerplate alone
    val boiler = (1 to 10).map(i => s"x$i").mkString(" ")
    val df = docs((1 to 6).map(i =>
      (i.toLong, s"$boiler u${i}a u${i}b u${i}c")): _*)
    val pairs = Winnow.winnowPairs(df, col("doc_id"), col("text"),
      k = 3, w = 4, minScore = 0.1, maxDf = 3)
    assert(pairs.count() == 0)
  }

  test("hashed (long-keyed) fingerprints honor the w+k-1 guarantee on seeded random corpora") {
    // the 100 TB form selects by NUMERIC xxhash64 min — different
    // (equally valid) fingerprints than the md5 route, so it is pinned
    // by the algorithm's guarantee, not an oracle: plant a shared run
    // of exactly w+k-1 tokens at random offsets in 20 random doc pairs
    val rnd = new scala.util.Random(0xBEEF)
    val k = 3; val w = 4; val need = w + k - 1
    val cases = (0 until 20).map { c =>
      val run = (1 to need).map(i => s"s${c}_$i").mkString(" ")
      def noise(n: Int, tag: String) =
        (1 to n).map(i => s"n${c}_${tag}_${rnd.nextInt(50)}_$i").mkString(" ")
      val a = s"${noise(rnd.nextInt(10), "a")} $run ${noise(rnd.nextInt(10), "a2")}"
      val b = s"${noise(rnd.nextInt(10), "b")} $run ${noise(rnd.nextInt(10), "b2")}"
      Seq((c * 2L, a.trim), (c * 2L + 1, b.trim))
    }
    val df = docs(cases.flatten: _*)
    val fps = Winnow.fingerprintsHashed(df, col("doc_id"), col("text"), k, w)
    val sharedPairs = fps.as("x").join(fps.as("y"),
        col("x.fp") === col("y.fp") &&
          col("x.doc_id") + 1 === col("y.doc_id") &&
          col("x.doc_id") % 2 === 0)
      .select((col("x.doc_id") / 2).cast("long").as("c")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(sharedPairs == (0L until 20L).toSet,
      s"pairs missing a shared fingerprint: ${(0L until 20L).toSet -- sharedPairs}")
    // disjoint-vocabulary docs share nothing
    val neg = Winnow.winnowPairsHashed(
      docs((100L, "p1 p2 p3 p4 p5 p6 p7"), (101L, "q1 q2 q3 q4 q5 q6 q7")),
      col("doc_id"), col("text"), k, w, minScore = 0.0)
    assert(neg.count() == 0)
    // and the hashed pairing finds the same planted pairs end to end
    val pairs = Winnow.winnowPairsHashed(df, col("doc_id"), col("text"),
        k, w, minScore = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 20).forall(c => pairs.contains((c * 2L, c * 2L + 1))),
      s"end-to-end hashed pairing missed a planted pair: $pairs")
  }

  test("spark fingerprints equal the declared oracle semantics on ties") {
    // duplicate tokens make equal md5 hashes inside one window: min is
    // still deterministic (equal strings), one distinct fp survives
    val df = docs((1L, "z z z z z z z z"))
    val fps = Winnow.fingerprints(df, col("doc_id"), col("text"), 3, 4)
      .collect().map(_.getString(1)).toSeq
    assert(fps.length == 1)
  }
}
