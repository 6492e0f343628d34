package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.stats.WinStats
import graft.vector.{Distance, Knn}

/** End-to-end query compositions (reference §3 entry points), built on
  * the harness `embeddings` fixture standing in for the Milvus
  * `case_files` chunk table (FIXTURES.md §1):
  *   - `court_level`  := `label` (10 classes, the scalar filter);
  *   - `file_id`      := `vec_id % 100` (5 "chunks" per document);
  *   - `case_decision`:= label % 3 → won/lost/invalid (3-valued enum).
  */
object Pipelines {

  /** Harness embeddings table dressed up as the reference chunk table.
    * `case_decision` derives from `file_id` so it is document-consistent
    * (as at ingest, where one decision is replicated onto every chunk of
    * a file) yet varies within a court level — the win-stats path sees
    * all three labels.
    */
  def caseCorpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      col("embedding"),
      (col("vec_id") % 100).as("file_id"),
      col("label").as("court_level"),
      when(col("vec_id") % 100 % 3 === 0, WinStats.Won)
        .when(col("vec_id") % 100 % 3 === 1, WinStats.Lost)
        .otherwise(WinStats.Invalid).as("case_decision"))

  /** 1-row query-vector frame: the embedding of `vec_id = queryId`
    * (the reference's F5 representative embedding — first chunk of the
    * query document).
    */
  def queryVector(spark: SparkSession, dir: String, queryId: Long = 0L): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))

  /** Filtered, scored corpus: V1–V3 (scan + pushed filter + pruned
    * columns + L2 score against the broadcast query vector).
    */
  def scoredAtLevel(spark: SparkSession, dir: String, level: Int,
                    queryId: Long = 0L): DataFrame =
    Knn.scored(
      caseCorpus(spark, dir).where(col("court_level") === level),
      queryVector(spark, dir, queryId),
      col("embedding"), Distance.l2)
      .drop("embedding")

  /** The flagship query (§3.1 `search-similar-cases`): filtered KNN →
    * best-hit-per-document dedup → top-5 → appellant win statistics,
    * flattened to one row per result carrying the stats columns (the
    * README golden response shape, `/root/reference/README.md:17-64`).
    */
  def similarCases(spark: SparkSession, dir: String, level: Int = 3,
                   queryId: Long = 0L, k: Int = 5): DataFrame = {
    val scored = scoredAtLevel(spark, dir, level, queryId)
    val dedup  = Knn.bestPerGroup(scored, col("file_id"), col("vec_id"))
    val top    = Knn.topK(dedup, k, col("file_id"))
      .select("file_id", "vec_id", "case_decision", "score")
    val stats  = WinStats.over(top, col("case_decision"))
    top.crossJoin(broadcast(stats))
  }
}
