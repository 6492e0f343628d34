package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Rayleigh–Ritz exactness of the randomized (Halko) PCA route: on a
  * planted LOW-RANK corpus with `k ≥ rank`, the sketched subspace
  * contains every eigenvector, so the randomized eigenvalue and the
  * per-row scores must equal exact PCA's up to the 1e-6 quantization
  * grid — the `ann_pq_full_codebook`-style gate that separates "an
  * approximation that happens to look right" from "exact in the
  * regime the theory promises".
  */
class EmbStatsRandomizedSpec extends AnyFunSuite with SparkSpec {

  private val dim = 16
  private val k = 6

  /** Rank-2 corpus: x = a·g1 + b·g2 with deterministic per-row (a, b),
    * var along g1 ≫ var along g2 (clean eigengap for both power
    * iterations), plus a constant offset (exercises centering).
    */
  private def planted = {
    import spark.implicits._
    val g1 = Array.tabulate(dim)(i => ((i * 7 + 3) % 11 - 5) * 0.08)
    val g2 = Array.tabulate(dim)(i => ((i * 5 + 1) % 13 - 6) * 0.05)
    val rows = (0 until 240).map { r =>
      val a = ((r % 9) - 4) * 0.5       // spread ~[-2, 2]
      val b = (((r * 7) % 5) - 2) * 0.1 // spread ~[-0.2, 0.2]
      (r.toLong,
        Array.tabulate(dim)(i => (0.3 + a * g1(i) + b * g2(i)).toFloat))
    }
    rows.toDF("id", "emb")
  }

  test("eigenvalue equals exact PCA's at k >= rank") {
    val df = planted
    val exact = EmbStats.pcaTop(df, col("emb").cast("array<float>"), dim)
      .select("eigenvalue").head().getDouble(0)
    val (_, _, rand) = EmbStats.randomizedTop(
      df, col("emb").cast("array<float>"), dim, k, iters = 12, scale = 10000)
    assert(exact > 1e-3, s"degenerate fixture: exact eigenvalue $exact")
    assert(math.abs(rand - exact) <= 1e-3 * math.max(exact, 1.0),
      s"randomized eigenvalue $rand != exact $exact")
  }

  test("per-row scores equal exact pcaProject's up to a global sign") {
    val df = planted
    val exact = EmbStats.pcaProject(df, col("id"),
        col("emb").cast("array<float>"), dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rand = EmbStats.pcaRandomized(df, col("id"),
        col("emb").cast("array<float>"), dim, k)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rand.keySet == exact.keySet)
    // align the arbitrary global sign on the largest-|score| row
    val anchor = exact.maxBy { case (_, v) => math.abs(v) }._1
    val sign = if (exact(anchor) * rand(anchor) < 0) -1.0 else 1.0
    val maxDiff = exact.keys
      .map(id => math.abs(exact(id) - sign * rand(id))).max
    assert(maxDiff <= 1e-3, s"max |exact - randomized| score diff $maxDiff")
  }

  test("dependent sketch columns collapse to zeros instead of noise directions") {
    val df = planted
    val (q, w, _) = EmbStats.randomizedTop(
      df, col("emb").cast("array<float>"), dim, k, iters = 12, scale = 10000)
    // rank(C) = 2 → at most 2 substantial basis columns; the rest must
    // be exactly zero (norm-0 guard) or carry ~zero subspace weight
    val live = q.count(col => col.exists(math.abs(_) > 0L))
    assert(live >= 2, s"basis lost the planted rank-2 span: $live live columns")
    val wNorm = math.sqrt(w.map(x => x.toDouble * x).sum)
    q.indices.filter(j => q(j).forall(_ == 0L)).foreach { j =>
      assert(math.abs(w(j)) <= 0.02 * wNorm,
        s"zero basis column $j carries eigenvector weight ${w(j)}")
    }
  }
}
