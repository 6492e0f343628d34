package graft.streaming

import scala.math.BigDecimal

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis
import graft.vector.Distance

/** Streaming HYBRID retrieval: a stream of queries carrying BOTH an
  * embedding and a term list, each answered with its reciprocal-rank
  * fusion of the vector route (L2 vs a static corpus) and the lexical
  * route (BM25 over a static postings index) — the continuous form of
  * the batch `q_hybrid_rrf` composition.
  *
  * Shape: both routes generate candidates STATELESSLY per micro-batch
  * (constant-key broadcast fan-out for vector; term → postings
  * equi-join for lexical), tagged and unioned into ONE watermarked
  * windowed aggregation. The [[StreamingHybrid.RrfAggregator]] owns
  * everything rank-shaped: per-route ordering, the per-document
  * token-sorted BM25 fold, reciprocal-rank fusion, final top-k.
  * Exactly one stateful operator — no chained aggregations, no
  * stream-stream join; state per (window, query) is bounded by the
  * candidate count (corpus for the vector route, queried tokens'
  * postings for the lexical route — pre-bound the static sides for
  * tighter state).
  */
object StreamingHybrid {

  /** One tagged candidate. route 0 = vector (value = L2, ascending
    * better); route 1 = lexical (value = one term's BM25 contribution;
    * summed per doc before ranking, descending better).
    */
  case class Cand(route: Int, doc: Long, token: String, value: Double)

  /** Fuses a (window, query)'s candidate multiset into the top-k by
    * RRF. Duplicate candidates (a query recurring within its window)
    * collapse via `distinct` — deterministic inputs make them exact
    * copies.
    */
  class RrfAggregator(k: Int, k0: Int = 60)
      extends Aggregator[Cand, Seq[Cand], Seq[(Long, Double)]] {
    def zero: Seq[Cand] = Nil
    def reduce(buf: Seq[Cand], c: Cand): Seq[Cand] = c +: buf
    def merge(a: Seq[Cand], b: Seq[Cand]): Seq[Cand] = a ++ b

    private def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    def finish(buf0: Seq[Cand]): Seq[(Long, Double)] = {
      val buf = buf0.distinct
      // vector route: rank ascending (L2, doc)
      val vecRank = buf.filter(_.route == 0)
        .sortBy(c => (c.value, c.doc)).map(_.doc)
        .zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
      // lexical route: per-doc token-sorted left fold (the bm25Join
      // determinism contract), then rank descending (score, asc doc)
      val lexScores = buf.filter(_.route == 1)
        .groupBy(_.doc).map { case (d, cs) =>
          d -> r4(cs.sortBy(_.token).foldLeft(0.0)(_ + _.value))
        }
      val lexRank = lexScores.toSeq
        .sortBy { case (d, s) => (-s, d) }.map(_._1)
        .zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
      val docs = (vecRank.keySet ++ lexRank.keySet).toSeq
      docs.map { d =>
        val s = vecRank.get(d).map(r => 1.0 / (k0 + r)).getOrElse(0.0) +
          lexRank.get(d).map(r => 1.0 / (k0 + r)).getOrElse(0.0)
        d -> r4(s)
      }.sortBy { case (d, s) => (-s, d) }.take(k)
    }

    def bufferEncoder: Encoder[Seq[Cand]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
  }

  /** `queries`: STREAMING (query_id, q_emb array<float>,
    * terms array<string>, ts). `corpus`: static (id, embedding).
    * `postings`/`dfs`/`stats`: the [[TextAnalysis.buildBm25Index]]
    * shapes (pass checkpointed/served frames — static plans re-run
    * per micro-batch). Emits (window, query_id, doc_id, rrf, rank).
    */
  def rrfPerQuery(queries: DataFrame, corpus: DataFrame,
                  postings: DataFrame, dfs: DataFrame, stats: DataFrame,
                  k: Int, k0: Int = 60,
                  windowDuration: String = "1 minute",
                  watermarkDelay: String = "5 minutes",
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = watermarked(queries, watermarkDelay)
    val vecCands = q.withColumn("__one", lit(1))
      .join(broadcast(corpus.select(col("id").as("doc"),
        col("embedding").as("c_emb")).withColumn("__one", lit(1))), "__one")
      .select(col("query_id"), col("ts"), lit(0).as("route"), col("doc"),
        lit("").as("token"),
        round(Distance.l2(col("q_emb"), col("c_emb")), 4).as("value"))
    fuse(vecCands, lexCands(q, postings, dfs, stats, k1, b),
      k, k0, windowDuration)
  }

  /** IVF-routed variant for beyond-broadcast corpora: the vector route
    * explodes each query to its `nprobe` nearest-centroid probe list
    * (codegen [[VectorKernels.nearestCentroids]]) and equi-joins the
    * cluster-assigned corpus on `cluster_id` — a shuffle/partition-
    * pruned join instead of a corpus broadcast, the same scale shape as
    * [[StreamingSearch.ivfKnnPerQuery]]. The vector candidate set is
    * the probed clusters' rows, so fusion output equals
    * [[rrfPerQuery]] exactly at `nprobe = nlist` (full probe ⇒ every
    * cluster ⇒ the whole corpus) and is the IVF approximation below
    * it — RRF ranks shift only where the un-probed clusters held
    * vector-route candidates. Lexical route and the single stateful
    * fusion aggregate are identical.
    */
  def rrfPerQueryIvf(queries: DataFrame, index: graft.vector.Ann.IvfIndex,
                     postings: DataFrame, dfs: DataFrame, stats: DataFrame,
                     k: Int, nprobe: Int, k0: Int = 60,
                     windowDuration: String = "1 minute",
                     watermarkDelay: String = "5 minutes",
                     k1: Double = 1.2, b: Double = 0.75,
                     emb: String = "embedding",
                     id: String = "vec_id"): DataFrame = {
    val q = watermarked(queries, watermarkDelay)
    val probed = q.withColumn("cluster_id",
      explode(graft.vector.VectorKernels.nearestCentroids(
        col("q_emb"), index.centroids, nprobe)))
    // each corpus row lives in exactly ONE cluster, so the equi-join
    // emits every (query, probed-cluster row) pair exactly once — no
    // dedup needed before the fusion aggregate
    val vecCands = probed
      .join(index.assigned.select(col(id).as("doc"), col(emb).as("c_emb"),
        col("cluster_id")), "cluster_id")
      .select(col("query_id"), col("ts"), lit(0).as("route"), col("doc"),
        lit("").as("token"),
        round(Distance.l2(col("q_emb"), col("c_emb")), 4).as("value"))
    fuse(vecCands, lexCands(q, postings, dfs, stats, k1, b),
      k, k0, windowDuration)
  }

  private def watermarked(queries: DataFrame, watermarkDelay: String): DataFrame =
    queries.select(col("query_id"), col("q_emb"), col("terms"), col("ts"))
      .withWatermark("ts", watermarkDelay)

  /** Lexical route: per-token postings equi-join, stateless. */
  private def lexCands(q: DataFrame, postings: DataFrame, dfs: DataFrame,
                       stats: DataFrame, k1: Double, b: Double): DataFrame =
    q.select(col("query_id"), col("ts"),
        explode(array_distinct(col("terms"))).as("token"))
      .join(postings, "token")
      .join(broadcast(dfs.crossJoin(broadcast(stats))), "token")
      .select(col("query_id"), col("ts"), lit(1).as("route"),
        col("id").as("doc"), col("token"),
        TextAnalysis.bm25Contrib(k1, b).as("value"))

  /** Union both routes into the ONE windowed fusion aggregate. */
  private def fuse(vecCands: DataFrame, lexCands: DataFrame,
                   k: Int, k0: Int, windowDuration: String): DataFrame = {
    val rrf = udaf(new RrfAggregator(k, k0), ExpressionEncoder[Cand]())
    vecCands.unionAll(lexCands)
      .groupBy(window(col("ts"), windowDuration), col("query_id"))
      .agg(rrf(col("route"), col("doc"), col("token"), col("value")).as("top"))
      .select(col("window"), col("query_id"), posexplode(col("top")))
      .select(col("window"), col("query_id"),
        col("col._1").as("doc_id"), col("col._2").as("rrf"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
