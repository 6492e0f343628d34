package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.vector.{Ann, VectorKernels}

/** Streaming multi-vector (MaxSim) retrieval — the continuous form of
  * [[graft.search.MaxSim]]: a stream of query FACETS (each query
  * carries several vectors) is answered with per-(query, document)
  * late-interaction scores against a static chunk corpus.
  *
  * Shape: candidates are generated STATELESSLY per micro-batch — the
  * broadcast fan-out of [[scoredPerQueryDoc]] for small corpora, or
  * the IVF probe-list equi-join of [[scoredPerQueryDocIvf]] beyond the
  * broadcast ceiling (the [[StreamingSearch]] two-tier pattern) —
  * and exactly ONE stateful operator runs — a watermarked windowed
  * aggregation keyed by (window, query, document) whose state is the
  * per-facet running max: BOUNDED BY THE QUERY'S VECTOR COUNT, never
  * by corpus, chunk count, or time (expired windows drop). The
  * aggregate finishes with the 1e-4-grid MaxSim sum, so scores are
  * engine-deterministic and equal the batch kernel's. Emission is the
  * per-(query, doc) scored feed in append mode; final top-k is a
  * bounded batch select over closed windows (the serving read), which
  * keeps the stream single-stateful — no chained aggregations.
  */
object StreamingMaxSim {

  /** One candidate observation: a query facet's similarity to one of a
    * document's chunks.
    */
  case class FacetSim(qvec_id: Long, sim: Double)

  /** Per-(window, query, doc) fold: running max PER FACET, finished
    * into Σ_facet max on the 1e-4 integer grid (aggregation-order
    * independent — the same double every engine computes).
    */
  class FacetMaxSum extends Aggregator[FacetSim, Map[Long, Double], Double] {
    def zero: Map[Long, Double] = Map.empty
    def reduce(m: Map[Long, Double], f: FacetSim): Map[Long, Double] =
      m.updated(f.qvec_id, math.max(m.getOrElse(f.qvec_id, Double.MinValue), f.sim))
    def merge(a: Map[Long, Double], b: Map[Long, Double]): Map[Long, Double] =
      b.foldLeft(a) { case (acc, (k, v)) =>
        acc.updated(k, math.max(acc.getOrElse(k, Double.MinValue), v))
      }
    def finish(m: Map[Long, Double]): Double =
      m.values.map(v => math.round(v * 10000d)).sum / 10000d
    def bufferEncoder: Encoder[Map[Long, Double]] = ExpressionEncoder()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** `queries`: STREAMING frame with (query_id: long, qvec_id: long,
    * q_emb: array<float>, ts: timestamp) — one row per query facet.
    * `corpus`: static (doc_id, embedding) chunk table. Emits
    * (window, query_id, doc_id, score) in append mode.
    */
  def scoredPerQueryDoc(queries: DataFrame, corpus: DataFrame,
                        windowDuration: String = "1 minute",
                        watermarkDelay: String = "5 minutes"): DataFrame = {
    val msAgg = udaf(new FacetMaxSum(), ExpressionEncoder[FacetSim]())
    val q = queries
      .select(col("query_id"), col("qvec_id"), col("q_emb"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .withColumn("__one", lit(1))
    val r = broadcast(corpus
      .select(col("doc_id"), col("embedding").as("c_emb"))
      .withColumn("__one", lit(1)))
    q.join(r, "__one")
      .select(col("ts"), col("query_id"), col("qvec_id"), col("doc_id"),
        round(VectorKernels.cosine(col("c_emb"), col("q_emb")), 4).as("sim"))
      .groupBy(window(col("ts"), windowDuration), col("query_id"),
        col("doc_id"))
      .agg(msAgg(col("qvec_id"), col("sim")).as("score"))
  }

  /** IVF-routed candidate generation — the beyond-broadcast tier.
    * [[scoredPerQueryDoc]] broadcasts the CORPUS against the facet
    * stream, which caps at the broadcast ceiling (a few million
    * 1536-dim chunks already exceed it, and broadcast is the one join
    * strategy that cannot spill). Here each arriving facet computes its
    * `nprobe` probe list with the codegen
    * [[VectorKernels.nearestCentroids]] kernel and EQUI-JOINS the
    * cluster-keyed corpus on `cluster_id` (the
    * [[StreamingSearch.ivfKnnPerQuery]] shape): candidates are
    * nprobe/nlist of the cross product instead of all of it, the
    * static side shuffles/prunes like any equi-join — and with the
    * assignment persisted cluster-partitioned ([[Ann.saveIvf]]) the
    * scan prunes at the directory level. The same windowed facet-max
    * aggregate folds candidates, so at `nprobe = nlist` every (facet,
    * chunk) pair is a candidate exactly once and the emitted scores
    * EQUAL [[scoredPerQueryDoc]]'s — the full-probe setting sits under
    * the same oracle gate; partial probe is the recall dial (a facet
    * maxes over its probed clusters only, so per-(query, doc) scores
    * are ≤ the full-probe scores — pinned in StreamingMaxSimSpec).
    *
    * `emb`/`id` name the INDEX side's chunk-vector and document-id
    * columns, mirroring [[Ann.ivfKnnJoin]].
    */
  def scoredPerQueryDocIvf(queries: DataFrame, index: Ann.IvfIndex,
                           nprobe: Int,
                           windowDuration: String = "1 minute",
                           watermarkDelay: String = "5 minutes",
                           emb: String = "embedding",
                           id: String = "doc_id"): DataFrame = {
    val msAgg = udaf(new FacetMaxSum(), ExpressionEncoder[FacetSim]())
    val q = queries
      .select(col("query_id"), col("qvec_id"), col("q_emb"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .withColumn("cluster_id",
        explode(VectorKernels.nearestCentroids(col("q_emb"),
          index.centroids, nprobe)))
    val r = index.assigned
      .select(col(id).as("doc_id"), col(emb).as("c_emb"), col("cluster_id"))
    q.join(r, "cluster_id")
      .select(col("ts"), col("query_id"), col("qvec_id"), col("doc_id"),
        round(VectorKernels.cosine(col("c_emb"), col("q_emb")), 4).as("sim"))
      .groupBy(window(col("ts"), windowDuration), col("query_id"),
        col("doc_id"))
      .agg(msAgg(col("qvec_id"), col("sim")).as("score"))
  }

  /** Fully-continuous ranking: CHAIN a second windowed aggregation on
    * the scored feed (Spark's chained time-window aggregations —
    * `window(window_col)` re-keys on the upstream window), so the
    * per-query top-k itself is stream-maintained state (bounded ≤2k
    * candidates per query, the [[graft.vector.GroupedTopK]] buffer)
    * and each query's final ranking emits exactly once on window
    * close. Two stateful operators total, both with bounded per-key
    * state; output contract matches the batch kernel's
    * (query_id, doc_id, score, rank).
    */
  def topKPerQuery(scored: DataFrame, k: Int,
                   windowDuration: String = "1 minute"): DataFrame = {
    val topk = udaf(new graft.vector.GroupedTopK.TopKAggregator(k),
      ExpressionEncoder[graft.vector.GroupedTopK.Scored]())
    scored
      .select(col("window"), col("query_id"), col("doc_id"),
        negate(col("score")).as("negscore"))
      .groupBy(window(window_time(col("window")), windowDuration),
        col("query_id"))
      .agg(topk(col("negscore"), col("doc_id")).as("top"))
      .select(col("window"), col("query_id"), posexplode(col("top")))
      .select(col("window"), col("query_id"), col("col.id").as("doc_id"),
        negate(col("col.score")).as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
