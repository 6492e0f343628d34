package graft.vector

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact top-k similarity joins via block-partitioned GEMM — the
  * dense-linear-algebra scale path the reference's Milvus deployment
  * would need for corpus-wide similarity (its IVF_FLAT index answers
  * one query vector at a time;
  * `/root/reference/extract_and_search.py:104-110` — this is the M×N
  * generalization, cf. SURVEY §2.7).
  *
  * Why blocking, not a pair join: the naive formulation (join +
  * window) materializes M·N scored rows and shuffles them by left id.
  * Here each side is split into B row-blocks; each of the B² block
  * pairs is one task that runs a cache-friendly fused loop over its
  * (m×d)·(d×n) tile and keeps only a k-heap per left row. Distribution
  * is SUMMA-style (cf. MLlib's BlockMatrix.multiply): each block is
  * explode-replicated B ways and the two sides equi-join on the
  * (left-block, right-block) key — shuffle volume B·(|L|+|R|) for the
  * tiles plus M·B·k partial candidates (never M·N, and never a
  * corpus-sized broadcast), with B² join keys so every core owns whole
  * tiles.
  *
  * Per-task memory bound (the REAL sizing constraint): a top-k tile
  * task buffers its LEFT block (it owns the per-row k-heaps) and
  * STREAMS the right side off the shuffle iterator — so the bound is
  * `(leftRows/bL) · (4·dim + ~40)` bytes plus `(leftRows/bL)·k` heap
  * slots, and the right extent of a tile costs no heap at all. The
  * two splits are therefore sized INDEPENDENTLY (the second tiling
  * level): `bL ≥ leftBytes / targetTileBytes` carries the memory
  * bound, `bR` only fills the parallelism floor and caps a task's
  * scan extent ([[chooseBlockCounts]]; the square
  * [[chooseNumBlocks]] remains for the symmetric self-join case).
  * [[cosinePairsAbove]] uses the same cogroup layout — one buffered
  * block (the left side: the diagonal tile needs random access to
  * pair a block against itself) and a streamed right side — so its B
  * is sized by [[chooseNumBlocks]] directly, no 2× slack. The final
  * merge (top-k routes only) is the bounded-state
  * [[GroupedTopK.TopKAggregator]], so no group ever sorts in full.
  *
  * Determinism contract (matches [[VectorKernels]] and the DuckDB
  * oracle): distances accumulated sequentially in doubles, rounded
  * HALF_UP to 4dp before ranking; ties break on ascending right id.
  * Rows with null ids/embeddings are dropped (cosine additionally
  * drops zero vectors — they cannot rank).
  */
object BlockMatrix extends Serializable {

  /** One corpus row inside a block. */
  final case class BlockRow(id: Long, emb: Array[Float])

  /** Per-tile top-k candidate (public: encoder codegen needs the ctor). */
  final case class Partial(left_id: Long, right_id: Long, score: Double)

  /** Block count honoring the per-task heap bound: a top-k tile task
    * materializes one left row-block (the streamed right side costs
    * one row), so a block must fit a task's working heap.
    * `B = max(ceil(sideBytes / targetTileBytes), parallelismFloor)`,
    * where `sideBytes ≈ rows · (4·dim + 40)` (float payload + JVM row
    * overhead). Defaults: 256 MB tiles, floor 16.
    */
  def chooseNumBlocks(rows: Long, dim: Int,
                      targetTileBytes: Long = 256L << 20,
                      parallelismFloor: Int = 16): Int = {
    require(rows >= 0 && dim > 0 && targetTileBytes > 0 && parallelismFloor > 0,
      "rows/dim/targetTileBytes/parallelismFloor must be positive")
    val sideBytes = rows * (4L * dim + 40L)
    val byMemory = (sideBytes + targetTileBytes - 1) / targetTileBytes
    math.max(byMemory, parallelismFloor.toLong).min(Int.MaxValue).toInt
  }

  /** Asymmetric block counts for the top-k join — the second tiling
    * level the square layout lacks. A top-k tile task buffers only its
    * LEFT block and streams the right side, so the heap bound
    * constrains ONLY `bL = ceil(leftBytes / targetTileBytes)`; the
    * right split exists purely to (a) keep `bL·bR` tiles at or above
    * the parallelism floor and (b) bound a single task's scan extent
    * (`rightRows/bR` rows), NOT its memory. Decoupling matters at
    * scale: square tiling replicates shuffle volume `B·(|L|+|R|)` with
    * one B serving both constraints, so a 10 TB left against a 100 GB
    * right pays a 40-way replication of the RIGHT side it never
    * needed; here volume is `bR·|L| + bL·|R|` with bR staying at the
    * floor. `maxTaskScanRows` (default 4M) caps per-task right-extent
    * so stragglers cannot hide inside one tile.
    */
  def chooseBlockCounts(leftRows: Long, rightRows: Long, dim: Int,
                        targetTileBytes: Long = 256L << 20,
                        parallelismFloor: Int = 16,
                        maxTaskScanRows: Long = 4000000L): (Int, Int) = {
    require(leftRows >= 0 && rightRows >= 0 && dim > 0 && targetTileBytes > 0 &&
      parallelismFloor > 0 && maxTaskScanRows > 0,
      "rows/dim/targetTileBytes/parallelismFloor/maxTaskScanRows must be positive")
    val leftBytes = leftRows * (4L * dim + 40L)
    val bL = math.max(1L, (leftBytes + targetTileBytes - 1) / targetTileBytes)
      .min(Int.MaxValue).toInt
    val byFloor = (parallelismFloor.toLong + bL - 1) / bL
    val byScan = (rightRows + maxTaskScanRows - 1) / maxTaskScanRows
    val bR = math.max(1L, math.max(byFloor, byScan)).min(Int.MaxValue).toInt
    (bL, bR)
  }

  /** Identical value to Spark's `round(x, 4)`: HALF_UP on the decimal
    * string form. Costs ~a BigDecimal per call, so the hot loop only
    * invokes it for candidates that can actually enter the heap.
    */
  private def round4dp(x: Double): Double =
    new JBigDecimal(java.lang.Double.toString(x))
      .setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** Sum of squares, same sequential accumulation order as the fused
    * [[VectorKernels.Cosine]] kernel's independent `na`/`nb` sums.
    */
  private def sumSq(a: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val x = a(i).toDouble; acc += x * x; i += 1 }
    acc
  }

  /** Rounding moves a value by at most 5e-5 (+ last-ulp slack); a raw
    * score this far on the wrong side of the current worst ROUNDED
    * score cannot reach it after rounding, so the heap decision can
    * skip rounding it.
    */
  private final val RoundMargin = 1e-4

  /** For each corpus row, its k nearest neighbors by cosine similarity
    * over all OTHER rows (self-pairs excluded — a dedup/similarity
    * sweep wants neighbors, not identities). Output: (left_id,
    * right_id, score, rank) with rank 1..k by (score desc, right_id).
    */
  def cosineTopK(df: DataFrame, idCol: Column, embCol: Column, k: Int,
                 numBlocks: Int = 16): DataFrame = {
    val base = prep(df, idCol, embCol)
    topKJoin(base, base, k, numBlocks, numBlocks,
      cosineMetric = true, excludeSelf = true)
  }

  /** [[cosineTopK]] with independently-sized left/right splits (see
    * [[chooseBlockCounts]] — left bounds memory, right bounds scan).
    */
  def cosineTopKBlocks(df: DataFrame, idCol: Column, embCol: Column, k: Int,
                       leftBlocks: Int, rightBlocks: Int): DataFrame = {
    val base = prep(df, idCol, embCol)
    topKJoin(base, base, k, leftBlocks, rightBlocks,
      cosineMetric = true, excludeSelf = true)
  }

  /** M×N exact L2 top-k join — identical output contract to
    * [[Knn.similarityJoin]] (score = round(l2, 4), rank 1..k ascending
    * (score, right_id), self-pairs included when the frames overlap),
    * but without broadcasting the right side: the scale route when
    * BOTH sides are large. Frames carry (`id`, `embedding`).
    */
  def l2Join(left: DataFrame, right: DataFrame, k: Int,
             numBlocks: Int = 16): DataFrame =
    l2JoinBlocks(left, right, k, numBlocks, numBlocks)

  /** [[l2Join]] with independently-sized left/right splits (see
    * [[chooseBlockCounts]] — left bounds memory, right bounds scan).
    */
  def l2JoinBlocks(left: DataFrame, right: DataFrame, k: Int,
                   leftBlocks: Int, rightBlocks: Int): DataFrame =
    topKJoin(prep(left, col("id"), col("embedding")),
      prep(right, col("id"), col("embedding")),
      k, leftBlocks, rightBlocks, cosineMetric = false, excludeSelf = false)

  private def prep(df: DataFrame, idCol: Column, embCol: Column): DataFrame =
    df.select(idCol.cast("long").as("id"), embCol.cast("array<float>").as("emb"))
      .where(col("id").isNotNull && col("emb").isNotNull)

  /** Deterministic block id: SplitMix64-scrambled residue. A PLAIN
    * `id % b` residue is degenerate under structured id spaces — ids
    * that share a stride (snowflake ids, partition-prefixed ids, any
    * generator emitting multiples of 2^k) land in a handful of blocks,
    * and one task then buffers an arbitrarily large fraction of the
    * corpus no matter what [[chooseNumBlocks]] computed. The mix is a
    * bijection on Long (Steele et al., "Fast Splittable Pseudorandom
    * Number Generators", the JDK SplittableRandom finalizer), so block
    * occupancy is uniform for ANY id distribution, the memory bound
    * actually holds adversarially, and the assignment stays a pure
    * function of (id, b) — no RNG state, reproducible across runs.
    * Block assignment only partitions work; results are unaffected
    * (BlockMatrixSpec pins tiling invariance).
    */
  private[vector] def blockId(id: Long, b: Int): Int = {
    var z = id + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (((z % b) + b) % b).toInt
  }

  /** All pairs (id_a < id_b) with 4dp-rounded cosine ≥ `minCosine` —
    * the tiled scale route for [[graft.dedup.EmbeddingDedup]]'s exact
    * tier. Identical output contract to `cosinePairs` (same rounding,
    * same threshold-on-rounded comparison), but no broadcast and no
    * M×N row materialization: only the B(B+1)/2 UPPER-TRIANGLE block
    * pairs are computed (cosine is symmetric — tile (j,i) would repeat
    * tile (i,j) with the ids swapped), each as one fused loop over its
    * tile, emitting only qualifying pairs. No merge stage exists —
    * a threshold join has no cross-tile state at all, so the output
    * stream is pure map-side work after the one tile-pairing shuffle.
    *
    * Per-task memory bound and `numBlocks` sizing as per the class
    * doc / [[chooseNumBlocks]]. The OUTPUT can still be quadratic if
    * the threshold is loose — that is the problem's nature, not the
    * plan's; the compute and shuffle are tiled regardless.
    */
  def cosinePairsAbove(df: DataFrame, idCol: Column, embCol: Column,
                       minCosine: Double, numBlocks: Int = 16): DataFrame = {
    require(numBlocks > 0, "numBlocks must be positive")
    val base = prep(df, idCol, embCol)
    val spark = base.sparkSession
    import spark.implicits._
    val b = numBlocks
    val thr = minCosine
    // Same flat-row cogroup distribution as [[topKJoin]] (the second
    // tiling level, r5): each row replicates individually to the
    // upper-triangle tiles where its block is the LEFT side (diagonal
    // included) and those where it is the RIGHT side; the cogroup
    // hands every tile its two sides as separate iterators. The LEFT
    // side is buffered — a threshold join has no per-row state, but
    // the diagonal tile needs random access to pair a block against
    // itself — and the RIGHT side STREAMS off the shuffle run one row
    // at a time, its norm computed on the fly. Per-task memory is ONE
    // block (+ one streamed row), not two: the sizing guidance that
    // previously said "size B for 2× on the pairs route" now matches
    // [[chooseNumBlocks]] exactly. A whole-block replication would
    // also re-serialize each block array bR times through the
    // exchange; flat rows shuffle the same bytes without the
    // per-group array materialization on the map side.
    val lkv = base.as[BlockRow]
      .flatMap { r =>
        val lb = blockId(r.id, b)
        (lb until b).iterator.map(j => (lb.toLong * b + j, r))
      }
      .groupByKey(_._1)
    val rkv = base.as[BlockRow]
      .flatMap { r =>
        val rb = blockId(r.id, b)
        (0 until rb).iterator.map(i => (i.toLong * b + rb, r))
      }
      .groupByKey(_._1)
    val bb = b.toLong
    val out = lkv.cogroup(rkv) { (key, lit, rit) =>
      val lrows = lit.map(_._2).toArray
      if (lrows.isEmpty) Iterator.empty
      else {
        val diagonal = key % bb == key / bb
        // hoisted left norms, same sequential accumulation as the
        // fused kernel (bit-identical scores)
        val nls = lrows.map(l => math.sqrt(sumSq(l.emb)))
        def pairs(rr: BlockRow, nr: Double, uptoExclusive: Int): Iterator[Partial] = {
          if (nr == 0.0) Iterator.empty
          else (0 until uptoExclusive).iterator.flatMap { li =>
            val l = lrows(li)
            val nl = nls(li)
            if (nl == 0.0 || l.id == rr.id) Iterator.empty
            else {
              val lemb = l.emb
              val remb = rr.emb
              val d = math.min(lemb.length, remb.length)
              var dot = 0.0
              var i = 0
              while (i < d) { dot += lemb(i).toDouble * remb(i).toDouble; i += 1 }
              val s = round4dp(dot / (nl * nr))
              if (s >= thr && !s.isNaN) {
                val (a, bId) = if (l.id < rr.id) (l.id, rr.id) else (rr.id, l.id)
                Iterator.single(Partial(a, bId, s))
              } else Iterator.empty
            }
          }
        }
        if (diagonal)
          // a diagonal tile pairs the block against itself: row ri
          // against rows 0..ri−1 — each unordered pair exactly once
          lrows.iterator.zipWithIndex.flatMap { case (rr, ri) =>
            pairs(rr, math.sqrt(sumSq(rr.emb)), ri)
          }
        else
          rit.flatMap { t =>
            val rr = t._2
            pairs(rr, math.sqrt(sumSq(rr.emb)), lrows.length)
          }
      }
    }
    out.toDF().select(col("left_id").as("id_a"), col("right_id").as("id_b"),
      col("score").as("cosine"))
  }

  /** Shared SUMMA core. `cosineMetric`: cosine descending vs L2
    * ascending; both round HALF_UP to 4dp before the heap decides.
    */
  private def topKJoin(leftBase: DataFrame, rightBase: DataFrame, k: Int,
                       leftBlocks: Int, rightBlocks: Int, cosineMetric: Boolean,
                       excludeSelf: Boolean): DataFrame = {
    require(k > 0, "k must be positive")
    require(leftBlocks > 0 && rightBlocks > 0, "block counts must be positive")
    val spark = leftBase.sparkSession
    import spark.implicits._

    // SUMMA-style tile distribution as ONE shuffle of flat rows: each
    // left row replicates to its row-block's bR tiles, each right row
    // to its column-block's bL tiles, and a cogroup on the tile key
    // hands every tile its two sides as separate iterators. The left
    // side is buffered (it carries the per-row k-heaps); the RIGHT
    // side is STREAMED straight off the sorted shuffle run — it never
    // materializes. Per-task memory is therefore ONE left block plus
    // m·k heap slots, not two blocks — which is WHY the two splits are
    // sized independently (the second tiling level): bL alone carries
    // the heap bound, bR only caps a task's scan extent and fills the
    // parallelism floor ([[chooseBlockCounts]]). Shuffle volume is
    // bR·|L| + bL·|R| rows — a square B serving both constraints would
    // replicate the small side as many times as the big side needs,
    // and a cross join of whole-corpus rows would broadcast a corpus
    // to every task — fine at spec scale, fatal at 100 TB.
    //
    // The tile result is loop-order independent — scores are per-pair
    // (no cross-pair accumulation) and the heap keeps the top k of a
    // TOTAL order (score, then right id) — so no within-tile sort is
    // needed for determinism.
    val bL = leftBlocks
    val bR = rightBlocks
    // Tile keys are Long: Int `lb * bR + j` overflows at ~46k blocks —
    // and chooseBlockCounts crosses that around ~11 TB per side,
    // silently colliding distinct tiles in the cogroup (ADVICE r4).
    val lkv = leftBase.as[BlockRow]
      .flatMap { r =>
        val lb = blockId(r.id, bL)
        (0 until bR).iterator.map(j => (lb.toLong * bR + j, r))
      }
      .groupByKey(_._1)
    val rkv = rightBase.as[BlockRow]
      .flatMap { r =>
        val rb = blockId(r.id, bR)
        (0 until bL).iterator.map(i => (i.toLong * bR + rb, r))
      }
      .groupByKey(_._1)

    val kk = k
    val cos = cosineMetric
    val noSelf = excludeSelf
    val partials = lkv.cogroup(rkv) { (_, lit, rit) =>
      val lrows = lit.map(_._2).toArray
      if (lrows.isEmpty || rit.isEmpty) Iterator.empty
      else {
        val m = lrows.length
        // per-left-row bounded selection: worst-of-k at the root,
        // evicted by better candidates; "better" = nearer (higher
        // cosine / lower L2), then lower right id
        val hS = Array.ofDim[Double](m, kk)
        val hI = Array.ofDim[Long](m, kk)
        val sizes = new Array[Int](m)
        // cosine left norms hoisted once per tile, same sequential
        // accumulation as the fused kernel (bit-identical)
        val sqrtNas = if (cos) lrows.map(l => math.sqrt(sumSq(l.emb))) else null
        def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
          if (cos) s1 < s2 || (s1 == s2 && i1 > i2)
          else s1 > s2 || (s1 == s2 && i1 > i2)
        def siftDown(li: Int): Unit = {
          val s = hS(li); val ids = hI(li); val size = sizes(li)
          var p = 0
          var cont = true
          while (cont) {
            val lc = 2 * p + 1; val rc = lc + 1; var mi = p
            if (lc < size && worse(s(lc), ids(lc), s(mi), ids(mi))) mi = lc
            if (rc < size && worse(s(rc), ids(rc), s(mi), ids(mi))) mi = rc
            if (mi == p) cont = false
            else {
              val ts = s(p); s(p) = s(mi); s(mi) = ts
              val ti = ids(p); ids(p) = ids(mi); ids(mi) = ti
              p = mi
            }
          }
        }
        rit.foreach { case (_, rr) =>
          val remb = rr.emb
          val sqrtNb = if (cos) math.sqrt(sumSq(remb)) else 0.0
          if (!cos || sqrtNb > 0.0) {
            var li = 0
            while (li < m) {
              val l = lrows(li)
              val usable =
                if (cos) (!noSelf || rr.id != l.id) && sqrtNas(li) > 0.0
                else !noSelf || rr.id != l.id
              if (usable) {
                val lemb = l.emb
                val d = math.min(lemb.length, remb.length)
                var raw = 0.0
                if (cos) {
                  var dot = 0.0
                  var i = 0
                  while (i < d) { dot += lemb(i).toDouble * remb(i).toDouble; i += 1 }
                  raw = dot / (sqrtNas(li) * sqrtNb)
                } else {
                  var acc = 0.0
                  var i = 0
                  while (i < d) {
                    val t = lemb(i).toDouble - remb(i).toDouble
                    acc += t * t; i += 1
                  }
                  raw = math.sqrt(acc)
                }
                // hot-path cut: most pairs sit far on the wrong side of
                // the current worst; only possible entrants pay the
                // decimal rounding
                val size = sizes(li)
                val mayEnter = size < kk ||
                  (if (cos) raw + RoundMargin >= hS(li)(0)
                   else raw - RoundMargin <= hS(li)(0))
                if (!raw.isNaN && mayEnter) {
                  val s = round4dp(raw)
                  if (size < kk) {
                    hS(li)(size) = s; hI(li)(size) = rr.id; sizes(li) = size + 1
                    var c = size
                    while (c > 0 && worse(hS(li)(c), hI(li)(c),
                        hS(li)((c - 1) / 2), hI(li)((c - 1) / 2))) {
                      val p = (c - 1) / 2
                      val ts = hS(li)(p); hS(li)(p) = hS(li)(c); hS(li)(c) = ts
                      val ti = hI(li)(p); hI(li)(p) = hI(li)(c); hI(li)(c) = ti
                      c = p
                    }
                  } else if (worse(hS(li)(0), hI(li)(0), s, rr.id)) {
                    hS(li)(0) = s; hI(li)(0) = rr.id; siftDown(li)
                  }
                }
              }
              li += 1
            }
          }
        }
        (0 until m).iterator.flatMap(li =>
          (0 until sizes(li)).map(i => Partial(lrows(li).id, hI(li)(i), hS(li)(i))))
      }
    }

    // Global merge of the ≤bR partial k-sets per left row through the
    // bounded-state aggregate. The aggregate orders ascending
    // (score, id): L2 feeds its score directly; cosine feeds the
    // NEGATED score (`+ 0.0` normalizes -0.0 so the round-trip is
    // exact — HALF_UP is symmetric away from zero, so negation
    // commutes with the rounding already applied).
    val mergeIn = partials.toDF().select(col("left_id"),
      col("right_id").as("id"),
      (if (cosineMetric) negate(col("score")) + lit(0.0) else col("score")).as("score"))
    GroupedTopK.topKPerGroup(mergeIn, col("left_id"), k)
      .select(col("left_id"), col("id").as("right_id"),
        (if (cosineMetric) negate(col("score")) + lit(0.0) else col("score")).as("score"),
        col("rank"))
  }
}
