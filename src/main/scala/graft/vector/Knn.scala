package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's only query shape — filtered KNN vector search plus
  * its client-side post-processing — restated as one declarative plan
  * (reference V1–V5, `/root/reference/extract_and_search_v2.py:124-159`).
  *
  * Physical shape Catalyst picks and why it scales:
  *  - scalar filter + column pruning reach the Parquet scan (V2/V3 —
  *    Milvus's bitset-prefilter / output_fields for free);
  *  - `orderBy(score).limit(k)` plans `TakeOrderedAndProject`: each
  *    partition keeps a k-sized heap, the driver merges P×k rows — no
  *    global sort, no shuffle of the corpus (V1/V5 — Milvus's top-k
  *    pushdown for free);
  *  - the query vector rides in as a broadcast cross join (1 row), so
  *    scoring is a narrow map over the corpus.
  *
  * Scores are rounded before ordering and ties broken on a unique id,
  * making the result set deterministic under any partitioning — the
  * reference silently depends on Milvus's sorted output for its dedup
  * (V4, `extract_and_search.py:113-127`); here the ordering contract is
  * explicit.
  */
object Knn {

  /** Attach a single query vector (1-row DataFrame with column
    * `q_emb`) to every corpus row via broadcast cross join — keeps the
    * whole query inside one lazily-planned DataFrame, no driver-side
    * collect.
    */
  def withQueryVector(corpus: DataFrame, query: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(query))

  /** Score + round. `roundTo` guards float-vs-double last-ulp drift
    * against columnar oracles while leaving ranking intact.
    */
  def scored(corpus: DataFrame, query: DataFrame, emb: Column,
             score: (Column, Column) => Column, roundTo: Int = 4): DataFrame =
    withQueryVector(corpus, query)
      .withColumn("score", round(score(emb, col("q_emb")), roundTo))
      .drop("q_emb")

  /** Deterministic top-k: ascending score (L2: smaller = closer), ties
    * broken by `tieBreak`. Plans TakeOrderedAndProject — per-partition
    * heap, no shuffle.
    */
  def topK(scored: DataFrame, k: Int, tieBreak: Column): DataFrame =
    scored.orderBy(col("score").asc, tieBreak.asc).limit(k)

  /** V4 group-dedup: best (lowest-score) hit per group, explicit about
    * the ordering the reference leaves implicit. Window shuffles by
    * `key` once; at scale prefer this over collect-side dicts — it is
    * the only shuffle in the flagship plan.
    */
  def bestPerGroup(scored: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("score").asc, tieBreak.asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Similarity join — the M×N generalization of the reference's 1×N
    * search (SURVEY §2.7): for every left row, its k nearest right rows
    * by L2. Brute force with the right side broadcast; the per-left-row
    * top-k runs as a window with `WindowGroupLimit` (per-partition heap
    * before any exchange). At corpus×corpus scale, pre-filter pairs
    * with the IVF cluster id or MinHash bands before this join — the
    * ranking semantics stay identical.
    *
    * `left`/`right`: (id, embedding) frames; output (left_id, right_id,
    * score, rank), deterministic via rounded-score + id tie-break.
    */
  def similarityJoin(left: DataFrame, right: DataFrame, k: Int,
                     roundTo: Int = 4): DataFrame = {
    val l = left.select(col("id").as("left_id"), col("embedding").as("l_emb"))
    val r = right.select(col("id").as("right_id"), col("embedding").as("r_emb"))
    val w = Window.partitionBy(col("left_id"))
      .orderBy(col("score").asc, col("right_id").asc)
    l.crossJoin(broadcast(r))
      .withColumn("score", round(Distance.l2(col("l_emb"), col("r_emb")), roundTo))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("left_id"), col("right_id"), col("score"), col("rank"))
  }
}
