package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UnigramSpec extends AnyFunSuite with SparkSpec {

  test("vocab contains every character and ranks multi-char pieces by mass") {
    import spark.implicits._
    val docs = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val v = Unigram.vocab(docs, col("text"), k = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // chars a, b, c, d all present
    assert(Set("a", "b", "c", "d").subsetOf(v.keySet))
    // "ab" occurs 2x in each "abab" -> cnt 4; "ba" once per word -> 2
    assert(v("ab")._1 == 4L && v.get("ba").forall(_._1 <= 2L))
    // costs are decreasing in count (monotone -ln)
    assert(!v.contains("ba") || v("ab")._2 < v("ba")._2)
  }

  test("viterbi encode picks the cheap multi-char segmentation") {
    import spark.implicits._
    // k=1 admits only "ab" (mass 8) next to the chars; cost(ab) ==
    // cost(a) == cost(b) (equal masses), so ab|ab (2 pieces) strictly
    // beats a|b|a|b (4 pieces of the same unit cost)
    val docs = Seq(
      (1L, "abab abab abab abab"),
      (2L, "x y")).toDF("doc_id", "text")
    val e = Unigram.encode(docs, col("doc_id"), col("text"), k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (w1, p1, _) = e(1L)
    assert(w1 == 4L, "four words")
    assert(p1 == 8L, s"each abab must segment as ab|ab -> 8 pieces, got $p1")
    val (w2, p2, _) = e(2L)
    assert(w2 == 2L && p2 == 2L, "single-char words are one piece each")
  }

  test("encode cost equals the hand-computed DP on a fixed corpus") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa b")).toDF("doc_id", "text")
    // word histogram: aa x2, b x1. pieces: a cnt 4, aa cnt 2, b cnt 1
    // (k=1 multi-char -> aa selected). total = 4 + 1 + 2 = 7
    def cost(c: Long) = math.floor(-math.log(c / 7.0) * 10000d).toLong
    val cAA = cost(2); val cA = cost(4); val cB = cost(1)
    // with these masses TWO cheap chars beat the one rarer bigram —
    // the DP must take a|a, not aa
    assert(2 * cA < cAA)
    val e = Unigram.encode(docs, col("doc_id"), col("text"), k = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(e == ((3L, 5L, 2 * (2 * cA) + cB)),
      s"expected (3, 5, ${2 * (2 * cA) + cB}), got $e")
  }

  test("DP equals brute-force enumeration over every segmentation (random words)") {
    import spark.implicits._
    // seeded random corpus of short words; the test enumerates all
    // 2^(L-1) segmentations per word against the trained vocab
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val wordsList = Seq.fill(30)(
      (1 to (1 + rnd.nextInt(7))).map(_ => alphabet(rnd.nextInt(3))).mkString)
    val docs = Seq((1L, wordsList.mkString(" "))).toDF("doc_id", "text")
    val k = 10
    val vmap = Unigram.vocab(docs, col("text"), k)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    def brute(w: String): (Long, Long) = {
      // all segmentations via cut-point bitmasks; skip those using a
      // piece not in the vocab or longer than MaxPieceLen
      var best = (Long.MaxValue, Long.MaxValue)
      val n = w.length
      for (mask <- 0 until (1 << (n - 1))) {
        var cost = 0L; var pieces = 0L; var start = 0; var ok = true
        for (cut <- 0 until n) {
          val isEnd = cut == n - 1 || ((mask >> cut) & 1) == 1
          if (isEnd) {
            val piece = w.substring(start, cut + 1)
            vmap.get(piece) match {
              case Some(c) if piece.length <= Unigram.MaxPieceLen =>
                cost += c; pieces += 1
              case _ => ok = false
            }
            start = cut + 1
          }
        }
        if (ok && (cost < best._1 || (cost == best._1 && pieces < best._2)))
          best = (cost, pieces)
      }
      best
    }
    val expected = wordsList.distinct.map(w => w -> brute(w)).toMap
    val whExp = wordsList.groupBy(identity).view.mapValues(_.size).toMap
    val expTotal = whExp.toSeq.map { case (w, c) =>
      (c.toLong * expected(w)._2, c.toLong * expected(w)._1)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    val got = Unigram.encode(docs, col("doc_id"), col("text"), k)
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(got == expTotal, s"DP (pieces, cost) $got != brute $expTotal")
  }

  test("words past the DP bound take the exact char fallback") {
    import spark.implicits._
    val long = "z" * (Unigram.MaxWordLen + 5)
    val docs = Seq((1L, s"$long ab")).toDF("doc_id", "text")
    val e = Unigram.encode(docs, col("doc_id"), col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).head
    // the long word contributes one piece per char
    assert(e._2 >= (Unigram.MaxWordLen + 5).toLong,
      s"char fallback must count per-char pieces, got $e")
  }
}
