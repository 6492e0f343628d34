package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.oracle.Sql
import graft.vector.VectorKernels

/** Embedding-cosine near-duplicate detection — the vector-space dedup
  * tier (companion to the token tiers in [[Dedup]]): pairs of documents
  * whose embedding cosine similarity clears a threshold. In the
  * reference's world this is the "two filings of the same case" signal
  * its Milvus L2 search surfaces one query at a time
  * (`/root/reference/extract_and_search.py:104-110`); here it's the
  * M×N batch generalization.
  *
  * Two physical tiers:
  *
  *  - [[cosinePairs]] — exact all-pairs with the fused codegen cosine
  *    kernel ([[VectorKernels.Cosine]]). Quadratic: the correctness
  *    oracle and the small-N path, never the 100 TB plan. (Unlike
  *    Jaccard, dense cosine has no lossless inverted-index
  *    factorization — there is no sub-quadratic *exact* threshold
  *    join; scale requires the approximate tier below.)
  *  - [[cosineLshPairs]] — sign-random-projection LSH (Charikar):
  *    band keys from hyperplane sign bits → candidate pairs only
  *    within buckets → exact cosine verification. Sub-quadratic with
  *    recall governed by the (bands × bits) geometry: a pair at angle
  *    θ shares a band with probability 1 − (1 − (1−θ/π)^bits)^bands.
  *    Verification makes precision exact; only recall is approximate.
  */
object EmbeddingDedup {

  /** Default LSH geometry: 16 bands × 4 sign bits. At cosine ≥ 0.35
    * (θ ≈ 69°) per-band collision is (0.614)^4 ≈ 0.14 → recall ≈ 0.91;
    * at true near-dup thresholds (cosine ≥ 0.9, θ ≤ 26°) it is
    * (0.857)^4 ≈ 0.54 → recall ≈ 1 − 10⁻⁵. Random pairs (θ ≈ π/2)
    * collide at 0.5⁴ = 1/16 per band, which bounds bucket fan-out.
    */
  val NumBands = 16
  val BitsPerBand = 4

  /** Derive the sign-hyperplane banding geometry `(bands, bits)` from
    * the operating point instead of remembering it. A pair at cosine
    * `c` agrees on one sign bit with probability p = 1 − acos(c)/π
    * (Charikar), so it shares a `bits`-bit band with probability
    * p^bits and SOME of `bands` bands with 1 − (1 − p^bits)^bands.
    * Random pairs (cosine ≈ 0, p = ½) collide per band at 2^−bits —
    * so wider bands are the anti-flood direction, and the search
    * takes the LARGEST bits whose minimal qualifying band count fits
    * `maxBands` and the `maxPlanes` compute cap (bands·bits
    * hyperplane dot products per vector). This is exactly the trap
    * the r14 scaledown measured: the 16×4 default (sized for
    * 0.35-threshold recall) floods ~one candidate per RANDOM pair at
    * a 0.9 threshold, where this derivation yields 30×15 — expected
    * random collisions 30·2^−15 ≈ 10⁻³ per pair, recall ≥ 0.95 at
    * the threshold, and colinear exact copies still collide in every
    * band deterministically.
    */
  def geometryFor(minCosine: Double, targetRecall: Double = 0.95,
                  maxBands: Int = 32, maxPlanes: Int = 512): (Int, Int) = {
    require(minCosine > 0.0 && minCosine < 1.0,
      s"minCosine must be in (0, 1), got $minCosine")
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall must be in (0, 1), got $targetRecall")
    val p = 1.0 - math.acos(minCosine) / math.Pi
    val lnMiss = math.log1p(-targetRecall) // ln(1 − target) < 0
    (24 to 1 by -1).iterator.flatMap { bits =>
      val perBand = math.pow(p, bits)
      // minimal b with 1 − (1 − perBand)^b ≥ target
      val b = math.ceil(lnMiss / math.log1p(-perBand)).toInt
      if (b >= 1 && b <= maxBands && b * bits <= maxPlanes)
        Some((b, bits))
      else None
    }.nextOption().getOrElse((maxBands, 1))
  }

  /** Deterministic Gaussian hyperplanes, (bands·bits) × dim row-major.
    * `java.util.Random` is seeded and spec-pinned, so planes (hence
    * signatures, hence results) are identical across JVMs and runs.
    */
  def hyperplanes(dim: Int, bands: Int = NumBands, bits: Int = BitsPerBand,
                  seed: Long = 42L): Array[Double] = {
    val rng = new java.util.Random(seed)
    Array.fill(bands * bits * dim)(rng.nextGaussian())
  }

  /** Cosine similarity rounded to 4dp — continuous value, so HALF_UP
    * rounding is cross-engine safe (unlike exact ratios, which use
    * floor-truncation elsewhere in this package).
    */
  private def cos4(a: Column, b: Column): Column =
    round(VectorKernels.cosine(a, b), 4)

  /** Exact cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).
    * Plans as a broadcast nested-loop self-join whose condition runs
    * the fused codegen kernel — fine to a few 10⁵ rows, quadratic
    * beyond. The threshold compares on the 4dp-rounded value so the
    * DuckDB oracle ([[cosinePairsSql]]) decides boundary pairs
    * identically.
    */
  def cosinePairs(df: DataFrame, idCol: Column, embCol: Column,
                  minCosine: Double): DataFrame = {
    val base = df.select(idCol.cast("long").as("id"), embCol.as("emb"))
      .where(col("id").isNotNull && col("emb").isNotNull)
    // Streamed side repartitioned: a single-file source would otherwise
    // run the whole nested loop in one task. Build side broadcast
    // explicitly — the loop parallelizes over left partitions only.
    // Both predicates live in the join condition with `id_a < id_b`
    // FIRST: conjunction order is evaluation order, so the kernel runs
    // on N²/2 ordered pairs, not all N² (a pushed-down filter would be
    // ANDed in front and double the kernel work).
    base.repartition(col("id"))
      .select(col("id").as("id_a"), col("emb").as("emb_a"))
      .join(broadcast(base.select(col("id").as("id_b"), col("emb").as("emb_b"))),
        col("id_a") < col("id_b") && cos4(col("emb_a"), col("emb_b")) >= minCosine)
      .select(col("id_a"), col("id_b"), cos4(col("emb_a"), col("emb_b")).as("cosine"))
  }

  /** DuckDB twin of [[cosinePairs]] for the oracle gate. */
  def cosinePairsSql(table: String, idExpr: String, embExpr: String,
                     minCosine: Double): String =
    s"""SELECT id_a, id_b, cosine FROM (
       | SELECT l.$idExpr AS id_a, r.$idExpr AS id_b,
       |  ${Sql.cosine(s"l.$embExpr", s"r.$embExpr")} AS cosine
       | FROM $table l JOIN $table r ON l.$idExpr < r.$idExpr)
       |WHERE cosine >= $minCosine""".stripMargin

  /** Exact cosine near-dup pairs via block-tiled distribution — same
    * output contract as [[cosinePairs]] (id_a < id_b, 4dp-rounded
    * cosine ≥ threshold), but no corpus broadcast: the route when the
    * corpus outgrows a broadcast but the threshold is tight enough
    * that exactness matters more than the LSH tier's speed. Delegates
    * to [[graft.vector.BlockMatrix.cosinePairsAbove]] (upper-triangle
    * tiles, fused loops, bounded per-task memory).
    */
  def cosinePairsBlocked(df: DataFrame, idCol: Column, embCol: Column,
                         minCosine: Double, numBlocks: Int = 16): DataFrame =
    graft.vector.BlockMatrix.cosinePairsAbove(df, idCol, embCol, minCosine, numBlocks)

  /** Exact pairs with SIZE-DISPATCHED route selection: the broadcast
    * NLJ tier below `maxBroadcastRows`, the block-tiled tier above —
    * same output either way (route equivalence is oracle-proven by
    * `dedup_embedding_cosine` vs `dedup_embedding_blocked`). The probe
    * is a bounded `limit(budget+1).count()`, not a full count.
    *
    * Both tiers are O(n²) kernel work (exact dense threshold joins
    * have no lossless sub-quadratic factorization), so the default
    * cutover is COMPUTE-shaped, not just broadcast-memory-shaped: the
    * tiled route hoists per-row norms once per tile and runs fused
    * primitive loops, measured ~3.7× faster per pair than the codegen
    * kernel inside an NLJ condition (48.8s vs 13.2s at 20k×64d), so it
    * wins well before a 64-dim broadcast would strain memory. Past
    * ~10⁵ rows the honest answer is the LSH tier, not either exact
    * route.
    */
  def cosinePairsAuto(df: DataFrame, idCol: Column, embCol: Column,
                      minCosine: Double,
                      maxBroadcastRows: Long = 10000L): DataFrame = {
    val budget = math.min(maxBroadcastRows, Int.MaxValue - 1L).toInt
    val smallEnough = df.limit(budget + 1).count() <= budget
    if (smallEnough) cosinePairs(df, idCol, embCol, minCosine)
    else {
      val rows = df.count()
      val dim = df
        .where(embCol.isNotNull && size(embCol) > 0)
        .select(size(embCol).as("d")).head(1)
        .headOption.map(_.getInt(0)).getOrElse(64)
      cosinePairsBlocked(df, idCol, embCol, minCosine,
        graft.vector.BlockMatrix.chooseNumBlocks(rows, dim))
    }
  }

  /** Approximate cosine near-dup pairs via hyperplane LSH. Plan shape
    * (identical skeleton to [[Dedup.minhashPairs]]): narrow signature
    * kernel → explode to (band_key, id) → shuffle on band_key →
    * in-bucket self-join → distinct candidate pairs → exact-cosine
    * verification. Output ⊆ [[cosinePairs]] output (verification uses
    * the same rounded comparison); only recall is approximate.
    */
  def cosineLshPairs(df: DataFrame, idCol: Column, embCol: Column,
                     minCosine: Double, dim: Int,
                     bands: Int = NumBands, bits: Int = BitsPerBand,
                     seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bands, bits, seed)
    // Repartition once up front: signature kernels and the downstream
    // joins then parallelize even from a single-file source.
    val base = df.select(idCol.cast("long").as("id"), embCol.as("emb"))
      .where(col("id").isNotNull && col("emb").isNotNull)
      .repartition(col("id"))
    val keys = base.select(col("id"),
      explode(VectorKernels.hyperplaneBandKeys(col("emb"), planes, dim, bands, bits))
        .as("band_key"))
    val cands = keys.as("l")
      .join(keys.as("r"), col("l.band_key") === col("r.band_key")
        && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("emb").as("emb_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("emb").as("emb_b")), "id_b")
      .select(col("id_a"), col("id_b"), cos4(col("emb_a"), col("emb_b")).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
