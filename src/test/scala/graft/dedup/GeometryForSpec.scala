package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.vector.VectorKernels

/** Derived banding geometry (`Dedup.geometryFor`,
  * `EmbeddingDedup.geometryFor`): across the operating range the
  * derivation must pin analytic recall at the threshold ≥ target AND
  * take the most selective feasible geometry (the anti-flood bound the
  * r14 16×4-at-0.9 incident motivates — expected random collisions
  * stay ∝ true pairs instead of flooding one candidate per random
  * pair). Analytic sweep over thresholds 0.3–0.95 plus empirical
  * planted-pair legs through the REAL banding kernels.
  */
class GeometryForSpec extends AnyFunSuite with SparkSpec {

  private val thresholds = BigDecimal(0.30).to(BigDecimal(0.95),
    BigDecimal(0.05)).map(_.toDouble)
  private val target = 0.95

  // ---- MinHash ---------------------------------------------------------

  private def minhashRecall(j: Double, bands: Int): Double = {
    val r = Dedup.NumPerms / bands
    1.0 - math.pow(1.0 - math.pow(j, r), bands)
  }

  test("minhash geometry: recall >= target at every threshold, minimal bands") {
    thresholds.foreach { j =>
      val b = Dedup.geometryFor(j, target)
      assert(Dedup.NumPerms % b == 0, s"bands $b must divide 64 (j=$j)")
      assert(minhashRecall(j, b) >= target ||
        b == Dedup.NumPerms, // one-row floor: the best 64 perms can do
        f"j=$j%.2f bands=$b recall=${minhashRecall(j, b)}%.4f")
      // anti-flood minimality: no SMALLER divisor (wider bands, steeper
      // random falloff) already reaches the target
      (1 until b).filter(Dedup.NumPerms % _ == 0).foreach { smaller =>
        assert(minhashRecall(j, smaller) < target,
          s"j=$j: bands=$smaller already reaches target but $b was chosen")
      }
    }
  }

  test("minhash geometry pins the documented operating points") {
    assert(Dedup.geometryFor(0.9) == 8)   // the historical 8×8 default
    assert(Dedup.geometryFor(0.77) == 16) // the documented knee
    assert(Dedup.geometryFor(0.5) == 32)
  }

  test("minhash geometry: planted pairs at the threshold are caught (empirical)") {
    import spark.implicits._
    val j = 0.5
    val bands = Dedup.geometryFor(j, target)
    val rng = new java.util.Random(7)
    // planted pair i: m shared hashes + k uniques per side, J = m/(m+2k)
    val m = 30; val k = 15 // J = 30/60 = 0.5 exactly
    val nPairs = 300
    val rows = (0 until nPairs).flatMap { i =>
      val shared = Array.fill(m)(rng.nextLong())
      val ua = Array.fill(k)(rng.nextLong())
      val ub = Array.fill(k)(rng.nextLong())
      Seq((i.toLong * 2, shared ++ ua), (i.toLong * 2 + 1, shared ++ ub))
    }
    val bandsDf = rows.toDF("id", "sh")
      .select(col("id"), explode(ShingleKernel.bandHash64(
        Dedup.minhashSignatureFromHashes(col("sh")), bands)).as("bk"))
    val caught = bandsDf.as("a").join(bandsDf.as("b"),
        col("a.bk") === col("b.bk") &&
          col("b.id") === col("a.id") + 1 && col("a.id") % 2 === 0)
      .select(col("a.id")).distinct().count()
    val recall = caught.toDouble / nPairs
    assert(recall >= target - 0.07, // binomial noise at n=300
      s"empirical minhash recall $recall at J=$j with bands=$bands")
  }

  // ---- sign-hyperplane -------------------------------------------------

  private def hpRecall(c: Double, bands: Int, bits: Int): Double = {
    val p = 1.0 - math.acos(c) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, bits), bands)
  }

  test("hyperplane geometry: recall >= target, caps honored, max-selectivity") {
    thresholds.foreach { c =>
      val (b, bits) = EmbeddingDedup.geometryFor(c, target)
      assert(b >= 1 && b <= 32 && b * bits <= 512, s"c=$c got ($b, $bits)")
      assert(hpRecall(c, b, bits) >= target,
        f"c=$c%.2f ($b×$bits) recall=${hpRecall(c, b, bits)}%.4f")
      // anti-flood: no WIDER band (strictly more selective on random
      // pairs) is feasible under the same caps
      val p = 1.0 - math.acos(c) / math.Pi
      ((bits + 1) to 24).foreach { wider =>
        val need = math.ceil(math.log1p(-target) /
          math.log1p(-math.pow(p, wider))).toInt
        assert(need > 32 || need * wider > 512,
          s"c=$c: ${need}×$wider feasible but ($b, $bits) chosen")
      }
      // expected random collisions per random pair — the flood the r14
      // incident measured at ~1.0 with the batch default at c=0.9
      val flood = b * math.pow(2.0, -bits)
      if (c >= 0.85) assert(flood <= 1e-2, s"c=$c flood=$flood")
    }
  }

  test("hyperplane geometry pins the near-dup operating point") {
    assert(EmbeddingDedup.geometryFor(0.9) == (30, 15))
    // the trap geometry: at 0.9 the batch operator's 16×4 floods one
    // candidate per random pair; the derived geometry is 1000× tighter
    assert(16 * math.pow(2.0, -4.0) == 1.0)
    assert(30 * math.pow(2.0, -15.0) < 1e-3)
  }

  test("hyperplane geometry: planted pairs caught, random pairs don't flood (empirical)") {
    import spark.implicits._
    val c = 0.9
    val (b, bits) = EmbeddingDedup.geometryFor(c, target)
    val dim = 16
    val planes = EmbeddingDedup.hyperplanes(dim, b, bits, seed = 11L)
    val rng = new java.util.Random(23)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // planted pair: w = c·v + sqrt(1−c²)·u⊥ has cosine exactly c with v
    def mate(v: Array[Float]): Array[Float] = {
      val u = unit()
      val d = v.zip(u).map { case (a, x) => a * x }.sum
      val perp = u.zip(v).map { case (x, a) => x - d * a }
      val pn = math.sqrt(perp.map(x => x * x).sum)
      val s = math.sqrt(1 - c * c) / pn
      v.zip(perp).map { case (a, x) => (c * a + s * x).toFloat }
    }
    val nPairs = 200
    val nRandom = 200
    val planted = (0 until nPairs).flatMap { i =>
      val v = unit()
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, mate(v).toSeq))
    }
    val randoms = (0 until nRandom).map(i =>
      (1000000L + i, unit().toSeq))
    val df = (planted ++ randoms).toDF("id", "emb")
      .select(col("id"), explode(VectorKernels.hyperplaneBandKeys(
        col("emb").cast("array<float>"), planes, dim, b, bits)).as("bk"))
    val caught = df.as("a").join(df.as("b"),
        col("a.bk") === col("b.bk") &&
          col("b.id") === col("a.id") + 1 &&
          col("a.id") % 2 === 0 && col("a.id") < 1000000L)
      .select(col("a.id")).distinct().count()
    val recall = caught.toDouble / nPairs
    assert(recall >= target - 0.08, // binomial noise at n=200
      s"empirical hyperplane recall $recall at c=$c with ($b×$bits)")
    // flood: candidate pairs among the random block stay ∝ nothing —
    // analytic expectation b·2^-bits · C(200,2) ≈ 18; assert well under
    // the all-pairs 19900 (the incident's failure mode)
    val randCands = df.as("a").join(df.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id") &&
          col("a.id") >= 1000000L && col("b.id") >= 1000000L)
      .select(col("a.id"), col("b.id")).distinct().count()
    assert(randCands <= 200,
      s"random-pair candidate flood: $randCands of ${199 * 200 / 2}")
  }
}
