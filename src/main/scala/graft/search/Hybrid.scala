package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse ranked candidate lists from independent
  * routes — lexical ([[graft.text.TextAnalysis.bm25]]) and vector
  * ([[graft.vector.Ann]]) — with reciprocal-rank fusion
  * (Cormack/Clarke/Büttcher, public literature):
  * `rrf(d) = Σ_route 1/(k0 + rank_route(d))`.
  *
  * RRF operates on RANKS, never raw scores, so routes with
  * incomparable score scales (BM25 sums vs cosine) fuse without
  * calibration — which is exactly why it is the standard first fusion
  * for lexical+vector search. The reference has only the vector route
  * (`/root/reference/extract_and_search.py:104-110`); hybrid is §2.7
  * extension surface.
  *
  * Scale shape: each route produces a BOUNDED top-N candidate list
  * via `TakeOrderedAndProject` (per-partition heaps over the full
  * corpus — no global sort, no shuffle beyond the final k·partitions
  * rows). Everything downstream — ranking within a list, the fusion
  * join — touches ≤ N·routes rows, so the single-partition window in
  * [[ranked]] is bounded by construction, not by luck. The corpus is
  * scanned once per route; routes are independent jobs a scheduler
  * can overlap.
  */
object Hybrid {

  /** Attach 1-based ranks to a BOUNDED candidate list. `ord` must be a
    * total order (tie-break on the id) so ranks are deterministic.
    * The global window is intentional: inputs are top-N lists (see
    * class doc), never corpus-sized frames.
    */
  def ranked(candidates: DataFrame, idCol: Column, ord: Seq[Column]): DataFrame =
    candidates.select(idCol.as("id"),
      row_number().over(Window.orderBy(ord: _*)).cast("long").as("rank"))

  /** Reciprocal-rank fusion over routes of `(id, rank)` frames (the
    * [[ranked]] contract). Returns `(id, rrf)` with the fused score
    * rounded HALF_UP to 4dp. A document missing from a route simply
    * contributes nothing for it (full-outer join semantics).
    *
    * The per-route contributions are summed in FIXED route order via a
    * left-to-right join fold — float addition is not associative, so a
    * `groupBy(id).sum` over a union would be shuffle-order-dependent;
    * this form is bit-deterministic for any route count.
    */
  def rrfFuse(routes: Seq[DataFrame], k0: Int = 60): DataFrame = {
    require(routes.nonEmpty, "rrfFuse needs at least one route")
    val contribs = routes.zipWithIndex.map { case (r, i) =>
      r.select(col("id"),
        (lit(1.0) / (lit(k0.toDouble) + col("rank").cast("double"))).as(s"__rrf_$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = routes.indices
      .map(i => coalesce(col(s"__rrf_$i"), lit(0.0)))
      .reduce(_ + _)
    joined.select(col("id"), round(score, 4).as("rrf"))
  }
}
