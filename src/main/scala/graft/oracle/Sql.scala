package graft.oracle

/** Shared DuckDB-SQL fragments for `SparkEntry.oracleSql`.
  *
  * The harness's correctness gate runs every oracle statement in DuckDB
  * over the same parquet tables and hash-compares with the Spark
  * result, so these fragments must mirror the Spark plans value-for-
  * value: same casts (float→double before arithmetic), same rounding
  * (4dp on continuous floats — absorbs summation-order last-ulp drift),
  * same deterministic tie-breaks on unique ids.
  */
object Sql {

  /** Escape a string literal for SQL single quotes. */
  def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** L2 distance between two list<float> expressions, in doubles, 4dp. */
  def l2(a: String, b: String): String =
    s"round(list_distance(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])), 4)"

  /** Cosine similarity, doubles, 4dp. */
  def cosine(a: String, b: String): String =
    s"round(list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])), 4)"

  /** L2 norm of one list<float> expression, doubles, 4dp. */
  def norm(a: String): String =
    s"round(sqrt(list_sum(list_transform(CAST($a AS DOUBLE[]), x -> x * x))), 4)"

  /** The harness `embeddings` table dressed as the reference chunk
    * table — must match [[graft.api.Pipelines.caseCorpus]] exactly.
    */
  val caseCorpus: String =
    """SELECT vec_id, embedding, vec_id % 100 AS file_id, label AS court_level,
      | CASE (vec_id % 100) % 3 WHEN 0 THEN 'appellant_won' WHEN 1 THEN 'appellant_lost'
      |   ELSE 'invalid' END AS case_decision
      |FROM embeddings""".stripMargin

  /** 1-row query vector frame (embedding of vec_id = `id`). */
  def queryVector(id: Long): String =
    s"SELECT embedding AS q_emb FROM embeddings WHERE vec_id = $id"

  /** Scored corpus at one court level — mirrors
    * [[graft.api.Pipelines.scoredAtLevel]].
    */
  def scoredAtLevel(level: Int, queryId: Long = 0L): String =
    s"""SELECT c.vec_id, c.file_id, c.court_level, c.case_decision,
       | ${l2("c.embedding", "q.q_emb")} AS score
       |FROM ($caseCorpus) c, (${queryVector(queryId)}) q
       |WHERE c.court_level = $level""".stripMargin

  /** V4 group-dedup over the scored corpus. */
  def dedupAtLevel(level: Int): String =
    s"""SELECT file_id, vec_id, case_decision, score FROM (${scoredAtLevel(level)})
       |QUALIFY row_number() OVER (PARTITION BY file_id ORDER BY score, vec_id) = 1""".stripMargin

  /** V5 final top-k. */
  def top5AtLevel(level: Int): String =
    s"""SELECT file_id, vec_id, case_decision, score FROM (${dedupAtLevel(level)})
       |ORDER BY score, file_id LIMIT 5""".stripMargin

  /** A1–A3 win statistics over a relation with a case_decision column. */
  def winStats(rel: String): String =
    s"""SELECT win_count, total_valid_decisions,
       | CASE WHEN total_valid_decisions > 0
       |   THEN round(win_count * 100.0 / total_valid_decisions, 2)
       |   ELSE 0.0 END AS win_percentage,
       | result_count - total_valid_decisions AS invalid_decisions,
       | result_count
       |FROM (SELECT
       |   CAST(sum(CASE WHEN case_decision = 'appellant_won' THEN 1 ELSE 0 END) AS BIGINT) AS win_count,
       |   CAST(sum(CASE WHEN case_decision IN ('appellant_won','appellant_lost') THEN 1 ELSE 0 END) AS BIGINT) AS total_valid_decisions,
       |   count(*) AS result_count
       | FROM ($rel))""".stripMargin
}
