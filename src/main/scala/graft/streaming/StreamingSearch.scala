package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.vector.{Ann, Distance, GroupedTopK, VectorKernels}

/** Streaming vector search: a stream of query embeddings, each answered
  * with its exact top-k nearest corpus rows — the online counterpart of
  * the reference's request-response search
  * (`/root/reference/extract_and_search.py:104-110`), expressed as a
  * continuous query instead of a Flask handler.
  *
  * Plan shape, per micro-batch:
  *  1. stream-static broadcast hash join (constant key) fans each
  *     arriving query out to the corpus — stateless, the static side
  *     broadcast once, re-usable across batches;
  *  2. the fused codegen L2 kernel scores every (query, corpus) pair —
  *     narrow, no shuffle;
  *  3. the bounded-state grouped top-k aggregate keyed by (event-time
  *     window, query id) keeps ≤2k candidates per query in the state
  *     store; the watermark closes windows and APPEND mode emits each
  *     query's final ranking exactly once.
  *
  * State is bounded by in-horizon queries × O(k) — never by the corpus
  * and never by time (expired windows are dropped). A query's id must
  * not recur outside its window (recurrence within a window correctly
  * merges into one ranking). At corpus sizes beyond broadcast, swap
  * stage 1-2 for the IVF route ([[StreamingIvf]] maintains the
  * cluster-partitioned layout; probe inside `foreachBatch`).
  */
object StreamingSearch {

  /** `queries`: STREAMING frame with (query_id: long, q_emb:
    * array<float>, ts: timestamp). `corpus`: static (id, embedding).
    * Emits (window, query_id, corpus_id, score, rank) in append mode.
    */
  def knnPerQuery(queries: DataFrame, corpus: DataFrame, k: Int,
                  windowDuration: String = "1 minute",
                  watermarkDelay: String = "5 minutes"): DataFrame = {
    val q = queries
      .select(col("query_id"), col("q_emb"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .withColumn("__one", lit(1))
    val r = broadcast(corpus
      .select(col("id").as("corpus_id"), col("embedding").as("c_emb"))
      .withColumn("__one", lit(1)))
    windowedTopK(q.join(r, "__one"), k, windowDuration)
  }

  /** Shared ranking tail: candidates (query_id, ts, q_emb, corpus_id,
    * c_emb) → per-(window, query) top-k in append mode. One place owns
    * the scoring/rounding/rank contract for both routes.
    */
  private def windowedTopK(candidates: DataFrame, k: Int,
                           windowDuration: String): DataFrame = {
    val topk = udaf(new GroupedTopK.TopKAggregator(k),
      ExpressionEncoder[GroupedTopK.Scored]())
    candidates
      .withColumn("score", round(Distance.l2(col("q_emb"), col("c_emb")), 4))
      .groupBy(window(col("ts"), windowDuration), col("query_id"))
      .agg(topk(col("score"), col("corpus_id")).as("top"))
      .select(col("window"), col("query_id"), posexplode(col("top")))
      .select(col("window"), col("query_id"),
        col("col.id").as("corpus_id"), col("col.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF-routed variant for corpora beyond broadcast: each arriving
    * query computes its `nprobe` probe list with the codegen
    * [[VectorKernels.nearestCentroids]] kernel and equi-joins the
    * cluster-keyed corpus on `cluster_id` — candidates are
    * nprobe/nlist of the cross product instead of all of it, and with
    * the corpus stored cluster-partitioned
    * ([[StreamingIvf.assignAndWrite]]) the static side prunes at scan.
    * Same windowed bounded-state ranking and output contract as
    * [[knnPerQuery]]; results equal [[Ann.ivfKnnJoin]] at the same
    * probe setting (exact at nprobe = nlist).
    */
  def ivfKnnPerQuery(queries: DataFrame, index: Ann.IvfIndex, k: Int,
                     nprobe: Int,
                     windowDuration: String = "1 minute",
                     watermarkDelay: String = "5 minutes",
                     emb: String = "embedding",
                     id: String = "vec_id"): DataFrame = {
    val q = queries
      .select(col("query_id"), col("q_emb"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .withColumn("cluster_id",
        explode(VectorKernels.nearestCentroids(col("q_emb"),
          index.centroids, nprobe)))
    // emb/id name the INDEX side's columns, mirroring Ann.ivfKnnJoin —
    // an index built over differently-named corpus columns works on
    // both routes
    val r = index.assigned
      .select(col(id).as("corpus_id"), col(emb).as("c_emb"),
        col("cluster_id"))
    windowedTopK(q.join(r, "cluster_id"), k, windowDuration)
  }
}
