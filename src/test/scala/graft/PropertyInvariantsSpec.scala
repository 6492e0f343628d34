package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Components
import graft.operators.Splits
import graft.text.TextKernels
import graft.vector.BlockMatrix
import graft.dedup.EmbeddingDedup

/** Randomized route-equality invariants (seeded — deterministic across
  * runs). Fixed fixtures prove the cases we thought of; these sweep
  * the cases we didn't: every dual-route operator must agree with its
  * sibling on arbitrary inputs, not just planted ones.
  */
class PropertyInvariantsSpec extends AnyFunSuite with SparkSpec {

  test("connected components: local and distributed routes agree on random graphs") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 4) {
      val n = 20 + rnd.nextInt(40)
      val ids = (0 until n).map(_ => rnd.nextLong(1000)).distinct
      val edges = (0 until n).map { _ =>
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size)))
      }.filter(e => e._1 != e._2)
      val nodesDf = ids.toDF("id")
      val edgesDf = edges.toDF("id_a", "id_b")
      val local = Components.connectedComponents(nodesDf, edgesDf,
          localEdgeLimit = Long.MaxValue)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Components.connectedComponents(nodesDf, edgesDf,
          localEdgeLimit = -1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist, s"trial $trial: routes diverged")
      // canonical labels: every component labeled by its min member
      local.groupBy(_._2).foreach { case (lbl, members) =>
        assert(members.keys.min == lbl,
          s"trial $trial: component $lbl not labeled by min member")
      }
    }
  }

  test("TermStats kernel equals the split/filter column form on random text") {
    import spark.implicits._
    val rnd = new Random(7)
    val alphabet = "ab \t\n\f\rÉé"
    val terms = Seq("a", "ab", "é")
    val docs = (1 to 60).map { _ =>
      val len = rnd.nextInt(24)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.toDF("text")
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

  test("DocStats fused forms equal the column forms on random text") {
    import spark.implicits._
    val rnd = new Random(13)
    // stopwords + lang markers + digits + punct + multi-byte + all ws
    val words = Seq("the", "and", "of", "is", "der", "und", "el", "que",
      "le", "wo", "ni", "x9", "42", "a!b", "naïve", "€", "K")
    val seps = Seq(" ", "  ", "\t", "\n", "", "\f", "\r", "\n\n")
    val docs = (1 to 80).map { _ =>
      val len = rnd.nextInt(12)
      (1 to len).map(_ => words(rnd.nextInt(words.length)))
        .mkString(seps(rnd.nextInt(seps.length)),
          seps(rnd.nextInt(seps.length)), seps(rnd.nextInt(seps.length)))
    }.toDF("text")
    val t = col("text")
    val d = graft.text.TextAnalysis.docStats(t)
    val len = length(t)
    val fused = docs.select(
      graft.text.TextAnalysis.nTokensWsF(d), graft.text.TextAnalysis.avgWordLenF(d),
      graft.text.TextAnalysis.punctRatioF(d, len), graft.text.TextAnalysis.alphaRatioF(d, len),
      graft.text.TextAnalysis.stopwordRatioF(d), graft.text.TextAnalysis.qualityScoreF(d, len),
      graft.text.TextAnalysis.langIdF(d)).collect().map(_.toSeq).toSeq
    val cols = docs.select(
      graft.text.TextAnalysis.nTokensWs(t), graft.text.TextAnalysis.avgWordLen(t),
      graft.text.TextAnalysis.punctRatio(t), graft.text.TextAnalysis.alphaRatio(t),
      graft.text.TextAnalysis.stopwordRatio(t), graft.text.TextAnalysis.qualityScore(t),
      graft.text.TextAnalysis.langId(t)).collect().map(_.toSeq).toSeq
    assert(fused == cols)
  }

  test("stratified split routes agree on random strata and percents") {
    import spark.implicits._
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      val rows = (0 until 150 + rnd.nextInt(100)).map { i =>
        val stratum = if (rnd.nextInt(10) == 0) null
          else s"s${rnd.nextInt(4)}"
        (rnd.nextLong(1000000L), stratum)
      }.distinctBy(_._1)
      val df = rows.toDF("id", "lang")
      val tp = 10 + rnd.nextInt(80)
      val vp = rnd.nextInt(100 - tp)
      val exact = Splits.stratifiedExact(df, col("id"), col("lang"), tp, vp)
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      val scalable = Splits.stratifiedScalable(df, col("id"), col("lang"), tp, vp)
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      assert(scalable == exact, s"trial $trial ($tp,$vp): routes diverged")
    }
  }

  test("blocked cosine pairs equal the broadcast exact tier on random vectors") {
    import spark.implicits._
    val rnd = new Random(23)
    val vecs = (0L until 40L).map { i =>
      (i, Seq.fill(6)(rnd.nextFloat() * 2f - 1f))
    }.toDF("id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows(EmbeddingDedup.cosinePairs(vecs, col("id"), col("embedding"), 0.2))
    val blocked = rows(BlockMatrix.cosinePairsAbove(vecs, col("id"),
      col("embedding"), 0.2, numBlocks = 5))
    assert(blocked == exact)
  }

  test("mixture sampling is monotone in the rate: raising a rate only adds rows") {
    import spark.implicits._
    val rnd = new Random(31)
    val docs = (0L until 400L).map(i => (i, s"d${rnd.nextInt(3)}")).toDF("id", "grp")
    def kept(rate: Int): Set[Long] =
      graft.operators.Sampling.mixtureSample(docs, col("grp"), col("id"),
        Map("d0" -> rate, "d1" -> 50, "d2" -> 50))
        .where(col("grp") === "d0").collect().map(_.getLong(0)).toSet
    val samples = Seq(0, 20, 40, 60, 80, 100).map(kept)
    samples.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), "raising the rate must only add rows")
    }
    assert(samples.head.isEmpty && samples.last.size == docs
      .where(col("grp") === "d0").count())
  }

  test("int8 quantization on random vectors: round-trip error within scale/2 at any magnitude") {
    import spark.implicits._
    val rnd = new Random(77)
    // magnitudes spanning 6 orders — the per-vector scale must adapt
    val vecs = (0 until 40).map { i =>
      val mag = math.pow(10.0, (i % 7) - 3).toFloat
      Seq.fill(12)((rnd.nextFloat() * 2 - 1) * mag)
    }.toDF("e")
    val rows = vecs.select(graft.vector.Quantize.int8(
        col("e").cast("array<float>")).as("q"))
      .select("q.scale", "q.recon_err").collect()
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(0) / 2 + 5e-7)
    }
  }

  test("CDC chunks reassemble arbitrary documents under every modulus") {
    import spark.implicits._
    val rnd = new Random(23)
    val alphabet = "abcdefgh 01\n.,!?xyzXYZ"
    for (modulus <- Seq(16, 64, 256)) {
      val docs = (1L to 30L).map { i =>
        (i, (0 until rnd.nextInt(600)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      }.filter(_._2.nonEmpty)
      val chunks = graft.text.Cdc.cdcChunks(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), modulus)
        .select("id", "chunk_idx", "start", "chunk_len")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val cs = chunks.getOrElse(id, Array.empty).sortBy(_._2)
        assert(cs.nonEmpty && cs.head._3 == 1L, s"doc $id mod $modulus")
        cs.sliding(2).foreach {
          case Array(a, b) => assert(b._3 == a._3 + a._4,
            s"doc $id mod $modulus: gap/overlap between chunks")
          case _ =>
        }
        assert(cs.map(_._4).sum == text.length.toLong,
          s"doc $id mod $modulus: lengths do not cover the doc")
      }
    }
  }

  test("HLL registers only grow as a stream extends (monotone state)") {
    import spark.implicits._
    val rnd = new Random(31)
    val all = (0 until 3000).map(_ => ("g", rnd.nextInt(1500).toString))
    def regs(rows: Seq[(String, String)]) =
      graft.operators.Sketches.hllRegisters(rows.toDF("grp", "key"),
          col("grp"), col("key"))
        .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val first = regs(all.take(1000))
    val whole = regs(all)
    first.foreach { case (reg, mx) =>
      assert(whole.getOrElse(reg, 0) >= mx,
        s"register $reg shrank: $mx -> ${whole.get(reg)}")
    }
  }
}
