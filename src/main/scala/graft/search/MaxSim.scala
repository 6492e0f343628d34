package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.vector.{Ann, GroupedTopK, VectorKernels}

/** Multi-vector late-interaction retrieval (ColBERT-style MaxSim) —
  * the natural generalization of the reference's single-representative
  * document scoring (F5 takes chunk 0's embedding as THE document
  * vector, `/root/reference/extract_and_search.py:86-87`, a documented
  * information-losing shortcut): score every document by
  * `Σ_{query vectors} max_{doc chunk vectors} cosine(qv, dv)`, so each
  * query facet matches its best chunk instead of one pooled vector
  * matching everything.
  *
  * Plan shape at scale: the query side (queries × vectors-per-query —
  * small by the same contract as the reference's single query vector)
  * is BROADCAST against the chunk corpus, so the corpus never
  * shuffles for scoring; the per-(query-vector, doc) max and the
  * per-(query, doc) sum are ordinary partial-aggregating groupBys over
  * corpus-partitioned data; final per-query ranking runs through
  * [[GroupedTopK]]'s bounded O(k)-state aggregate. No cartesian
  * product, no window sort over the corpus.
  *
  * Cross-engine determinism: per-pair cosines round to 4dp (the
  * continuous-value contract), and the per-document sum runs on the
  * 1e-4 integer grid (scaled-long sum, one final double division) so
  * summation order can never move a rank.
  */
object MaxSim {

  /** Top-k documents per query under the MaxSim score.
    *
    * @param docVecs   chunk corpus: one row per (document, chunk vector)
    * @param queryVecs query vector sets: one row per (query, query vector);
    *                  must be small enough to broadcast (queries × dim)
    * @return (query_id, doc_id, score, rank) — rank 1..k by descending
    *         score, ascending doc_id on ties
    */
  def maxSimTopK(docVecs: DataFrame, docId: Column, chunkVec: Column,
                 queryVecs: DataFrame, queryId: Column, qvecId: Column,
                 queryVec: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val docs = docVecs.select(docId.cast("long").as("doc_id"),
      chunkVec.as("dvec"))
    val qs = queryVecs.select(queryId.cast("long").as("query_id"),
      qvecId.cast("long").as("qvec_id"), queryVec.as("qvec"))
    val sims = docs.join(broadcast(qs))
      .select(col("query_id"), col("qvec_id"), col("doc_id"),
        round(VectorKernels.cosine(col("dvec"), col("qvec")), 4).as("sim"))
    rankTail(sims, k)
  }

  /** IVF-pruned MaxSim — the scale tier. The exact route scores every
    * (query vector, chunk) pair; at corpus scale the probe dial trades
    * that for candidates ∝ nprobe/nlist: each query vector's
    * `nprobe` nearest clusters (codegen per-row probe list, no driver
    * loop) equi-join the cluster-keyed chunk corpus, facets max over
    * their CANDIDATE chunks only (a doc outside every probed cluster
    * of a facet contributes nothing for that facet — the standard
    * late-interaction pruning approximation), and the grid-sum/top-k
    * tail is shared with the exact route. With `nprobe = nlist` every
    * chunk is a candidate for every facet, so the result EXACTLY
    * equals [[maxSimTopK]] — the full-probe setting sits under the
    * same oracle gate, the pruning dial under the spec's recall check.
    * When the assignment is persisted cluster-partitioned
    * ([[Ann.saveIvf]]), the probe join's scan prunes at the directory
    * level.
    */
  def maxSimTopKIvf(docVecs: DataFrame, docId: Column, chunkVec: Column,
                    queryVecs: DataFrame, queryId: Column, qvecId: Column,
                    queryVec: Column, k: Int, nlist: Int = 16,
                    nprobe: Int = 4): DataFrame = {
    require(k > 0 && nlist > 0 && nprobe > 0, "k, nlist, nprobe must be positive")
    val docs = docVecs.select(docId.cast("long").as("doc_id"),
      chunkVec.as("dvec"))
    val index = Ann.buildIvf(docs, emb = "dvec", nlist = nlist)
    val qs = queryVecs.select(queryId.cast("long").as("query_id"),
      qvecId.cast("long").as("qvec_id"), queryVec.as("qvec"))
    val probes = qs.select(col("query_id"), col("qvec_id"), col("qvec"),
      explode(VectorKernels.nearestCentroids(col("qvec"), index.centroids,
        math.min(nprobe, nlist))).as("cluster_id"))
    val cands = probes.join(index.assigned, Seq("cluster_id"))
      .select(col("query_id"), col("qvec_id"), col("doc_id"),
        round(VectorKernels.cosine(col("dvec"), col("qvec")), 4).as("sim"))
    rankTail(cands, k)
  }

  /** Shared ranking tail: per-facet max over candidate chunks, 1e-4
    * grid document sum (scaled-long sum + one division — aggregation-
    * order-independent, so the same double in every engine), bounded
    * per-query top-k.
    */
  private def rankTail(sims: DataFrame, k: Int): DataFrame = {
    val perQvec = sims.groupBy("query_id", "qvec_id", "doc_id")
      .agg(max(col("sim")).as("best"))
    val scored = perQvec.groupBy("query_id", "doc_id")
      .agg((sum(round(col("best") * 10000d).cast("long")) / 10000d)
        .as("simscore"))
    GroupedTopK.topKPerGroup(
        scored.select(col("query_id"), col("doc_id").as("id"),
          negate(col("simscore")).as("score")),
        col("query_id"), k)
      .select(col("query_id"), col("id").as("doc_id"),
        negate(col("score")).as("score"), col("rank"))
  }

  /** DuckDB twin of [[maxSimTopK]] over the harness `embeddings` table
    * with `vec_id % 100` as the document key (the caseCorpus
    * convention) and the documents below `nQueries` as the query sets.
    */
  def maxSimSql(nQueries: Int, k: Int, docWhere: String = "TRUE"): String =
    s"""WITH docs AS (
       |  SELECT vec_id % 100 AS doc_id, embedding FROM embeddings
       |  WHERE $docWhere),
       |qs AS (
       |  SELECT vec_id % 100 AS query_id, vec_id AS qvec_id,
       |    embedding AS qvec
       |  FROM embeddings WHERE vec_id % 100 < $nQueries),
       |best AS (
       |  SELECT q.query_id, q.qvec_id, d.doc_id,
       |    max(${graft.oracle.Sql.cosine("d.embedding", "q.qvec")}) AS best
       |  FROM docs d, qs q GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT query_id, doc_id,
       |    SUM(CAST(round(best * 10000, 0) AS BIGINT)) / 10000.0 AS score
       |  FROM best GROUP BY 1, 2)
       |SELECT query_id, doc_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS INTEGER) AS rank
       |FROM scored
       |QUALIFY rank <= $k
       |ORDER BY query_id, rank""".stripMargin
}
