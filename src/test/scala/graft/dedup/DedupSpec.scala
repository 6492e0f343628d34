package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DedupSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat instead"),  // near dup of 1
      (4L, "completely different content about database engines"),
      (5L, "another unrelated text concerning vector search")
    ).toDF("id", "text")
  }

  test("exactDuplicates finds only the planted exact pair") {
    val out = Dedup.exactDuplicates(docs, col("id"), col("text")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_dups") == 2L)
    assert(out.head.getAs[Long]("keeper_id") == 1L)
  }

  test("jaccard: identical=1, disjoint=0, hand-computed overlap") {
    import spark.implicits._
    val j = Seq((Seq("a b c", "b c d"), Seq("a b c", "b c d"), Seq("x y z")))
      .toDF("s1", "s2", "s3")
      .select(
        Dedup.jaccard(col("s1"), col("s2")).as("same"),
        Dedup.jaccard(col("s1"), col("s3")).as("disjoint"))
      .collect().head
    assert(j.getAs[Double]("same") == 1.0)
    assert(j.getAs[Double]("disjoint") == 0.0)
  }

  test("minhash LSH catches exact duplicates and high-overlap near-dups") {
    val pairs = Dedup.minhashPairs(docs, col("id"), col("text"), minJaccard = 0.0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))   // jaccard 1.0 — must always be caught
    // unrelated docs never pair up
    assert(!pairs.contains((4L, 5L)))
  }

  test("minhash pairs agree with brute-force ngram pairs on planted dups") {
    val brute = Dedup.ngramJaccardPairs(docs, col("id"), col("text"), minJaccard = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = Dedup.minhashPairs(docs, col("id"), col("text"), minJaccard = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(brute == Set((1L, 2L)))
    assert(lsh == brute)   // at jaccard≥0.9 LSH recall is ~certain
  }

  test("prefix-filtered jaccard join equals the full inverted-index join") {
    val full = Dedup.ngramJaccardPairs(docs, col("id"), col("text"), minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.ngramJaccardPairsPrefix(docs, col("id"), col("text"), minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == full)
    assert(full.nonEmpty)   // the planted near-dup pair survives at 0.3
  }

  test("simhash: identical text → identical signature; near text → low hamming") {
    import spark.implicits._
    val sigs = docs.select(col("id"), Dedup.simhash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val nearDist = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val farDist  = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(nearDist < farDist)
    // hamming Column matches JVM bitCount
    val h = docs.where(col("id") === 1L)
      .select(Dedup.hamming(lit(sigs(1L)), lit(sigs(3L))).cast("int"))
      .collect().head.getInt(0)
    assert(h == nearDist)
  }

  test("simhashPairs equals the brute-force hamming filter (pigeonhole is lossless)") {
    import spark.implicits._
    val sigs = docs.select(col("id"), Dedup.simhash(col("text")).as("sig"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    val banded = Dedup.simhashPairs(docs, col("id"), col("text"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
    assert(banded.contains((1L, 2L, 0)))   // the planted exact pair
  }

  test("simhashPairs at maxHamming=0 is exact-signature grouping") {
    val pairs = Dedup.simhashPairs(docs, col("id"), col("text"), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhashPairs rejects band widths that do not divide 64") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, col("id"), col("text"), maxHamming = 4)
    }
  }

  // boilerplate corpus: every doc shares an 8-word template run, two
  // docs are true duplicates through their distinctive content
  private def boilerplate = {
    import spark.implicits._
    val template = "standard legal disclaimer applies to all filed documents"
    (1 to 20).map(i => (i.toLong, s"$template unique$i tail$i word$i"))
      .:+((21L, s"$template identical distinctive content here"))
      .:+((22L, s"$template identical distinctive content here"))
      .toDF("id", "text")
  }

  test("df-cut join equals the lossless join when shared content is rare") {
    val full = Dedup.ngramJaccardPairs(docs, col("id"), col("text"), minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cut = Dedup.ngramJaccardPairsDfCut(docs, col("id"), col("text"),
        minJaccard = 0.5, maxDf = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cut == full)
    assert(full.nonEmpty)
  }

  test("df-cut bounds candidate fan-out on a boilerplate corpus") {
    val base = boilerplate.select(col("id"),
      Dedup.shingleHashes(col("text")).as("sh"))
    val fullCands = Dedup.dfCutCandidates(base, maxDf = Long.MaxValue).count()
    val cutCands  = Dedup.dfCutCandidates(base, maxDf = 3L).count()
    // template shingles pair everyone with everyone: C(22,2) = 231
    assert(fullCands == 231L, s"expected all-pairs fan-out, got $fullCands")
    // rare-shingle candidates: just the true duplicate pair
    assert(cutCands == 1L, s"expected only the planted pair, got $cutCands")
    // and verification still finds the true duplicate pair, nothing else
    val pairs = Dedup.ngramJaccardPairsDfCut(boilerplate, col("id"), col("text"),
        minJaccard = 0.9, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((21L, 22L)))
  }

  test("edit-distance tier keeps small edits, drops rotations Jaccard can't see") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // one-word edit of 1: high jaccard AND small edit distance -> kept
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"),
      // rotation of 1: most 3-grams survive (high jaccard) but half the
      // characters moved -> edit distance far above 15% of length
      (3L, "zeta eta theta iota kappa alpha beta gamma delta epsilon"),
      (4L, "unrelated content entirely different words here now")
    ).toDF("id", "text")
    val cands = Dedup.ngramJaccardPairsPrefix(d, col("id"), col("text"),
      minJaccard = 0.5)
    val candSet = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candSet.contains((1L, 2L)) && candSet.contains((1L, 3L)),
      s"expected both the edit pair and the rotation among candidates: $candSet")
    val kept = Dedup.editVerifiedPairs(d, col("id"), col("text"), cands,
        maxRelPermille = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept.contains((1L, 2L)))
    assert(!kept.contains((1L, 3L)), "rotation must fail the character-level tier")
  }

  test("editVerifiedPairs counts distance in code points, not UTF-8 bytes") {
    import spark.implicits._
    // One CJK substitution: code-point distance 1 (what this engine
    // commits to), UTF-8 byte distance 3 (what DuckDB's levenshtein
    // would report — which is why the oracle gate's fixture is ASCII
    // by contract; see the editVerifiedPairs docstring).
    val d = Seq(
      (1L, "最高裁判所は上告を棄却する判決を言い渡した"),
      (2L, "最高裁判所は上告を棄却する判決を言い渡しだ")
    ).toDF("id", "text")
    val cands = Seq((1L, 2L)).toDF("id_a", "id_b")
    val rows = Dedup.editVerifiedPairs(d, col("id"), col("text"), cands,
      maxRelPermille = 150).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("edit_dist") == 1L,
      s"code-point distance expected 1, got ${r.getAs[Long]("edit_dist")}")
    assert(r.getAs[Long]("max_len") == 21L,
      s"code-point length expected 21, got ${r.getAs[Long]("max_len")}")
  }

  test("containment catches a near-superset pair that Jaccard misses") {
    import spark.implicits._
    val core = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = Seq(
      (1L, core),
      (2L, core + " " + (0 until 24).map(i => s"ext$i").mkString(" ")),
      (3L, "totally different words with no shared trigrams at all here")
    ).toDF("id", "text")
    val pairs = Dedup.containmentPairs(d, col("id"), col("text"),
        minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    val (_, _, contA, contB) = pairs.head
    assert(contA == 1.0, s"core fully contained, got $contA")
    assert(contB < 0.5, s"reverse direction must be dilute, got $contB")
    // the same pair is invisible to symmetric Jaccard at any usual threshold
    val jac = Dedup.ngramJaccardPairs(d, col("id"), col("text"), minJaccard = 0.5)
    assert(jac.count() == 0)
  }

  test("containmentPairs rejects non-positive thresholds") {
    intercept[IllegalArgumentException] {
      Dedup.containmentPairs(docs, col("id"), col("text"), minContainment = 0.0)
    }
  }

  test("editVerifiedPairs rejects out-of-range thresholds") {
    intercept[IllegalArgumentException] {
      Dedup.editVerifiedPairs(docs, col("id"), col("text"),
        docs.select(col("id").as("id_a"), col("id").as("id_b")), 1001)
    }
  }

  test("crossCorpusScreen: dup-of-ref dropped, fresh kept, ref never self-compared") {
    import spark.implicits._
    val newBatch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),  // dup of ref 1
      (11L, "genuinely novel content nothing like the rest at all")
    ).toDF("id", "text")
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // intra-ref dup: must NOT surface
      (3L, "completely different content about database engines")
    ).toDF("id", "text")
    val out = Dedup.crossCorpusScreen(newBatch, ref, col("id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("kept"), r.getAs[Long]("n_ref_dups"))).toMap
    assert(out(10L) == (false, 2L)) // matches ref 1 AND 2 — both counted
    assert(out(11L) == (true, 0L))
    val dropped = Dedup.crossCorpusScreen(newBatch, ref, col("id"), col("text"))
      .where(!col("kept")).collect().head
    assert(dropped.getAs[Long]("first_ref") == 1L) // lowest matching ref id
    assert(dropped.getAs[Double]("best_jaccard") == 1.0)
  }

  test("crossCorpusScreen rejects a zero threshold") {
    intercept[IllegalArgumentException] {
      Dedup.crossCorpusScreen(docs, docs, col("id"), col("text"), minJaccard = 0.0)
    }
  }
}
