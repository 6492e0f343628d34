package graft.vector

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a bounded-state aggregate — the scale-path
  * alternative to `Window.partitionBy(key).orderBy(...)` + row_number
  * (SURVEY §4's `TypedImperativeAggregate` candidate, expressed through
  * the public `Aggregator` + `udaf` API).
  *
  * Why it matters at 100 TB: a window sorts every group in full; this
  * aggregate keeps at most 2k candidates per group in the partial-
  * aggregation buffer, so map-side combine shrinks each group to ≤2k
  * rows *before* the shuffle and memory stays O(k) per group
  * regardless of group size. (Spark's `WindowGroupLimit` gets part of
  * this for rank filters; the aggregate form also composes inside
  * other aggregations and never materializes the sorted group.)
  */
object GroupedTopK {

  /** One scored candidate. Ordering: ascending (score, id) — callers
    * pass an already-rounded score so ranking is engine-deterministic.
    */
  case class Scored(score: Double, id: Long)

  class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    // distinct first: scores are deterministic per id, so an id seen
    // twice (e.g. a streaming query recurring within its window fans
    // its candidates out once per arrival) is the SAME candidate — it
    // must not occupy two ranks
    private def trim(s: Seq[Scored]): Seq[Scored] =
      s.distinct.sortBy(x => (x.score, x.id)).take(k)

    def zero: Seq[Scored] = Nil
    def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = {
      val nb = a +: buf
      if (nb.size > 2 * k) trim(nb) else nb
    }
    def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
    def finish(r: Seq[Scored]): Seq[Scored] = trim(r)
    def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Top-k rows per group: input must carry `score` (double, rounded)
    * and `id` (long) columns; emits (groupCols..., id, score, rank).
    */
  def topKPerGroup(df: DataFrame, groupCol: Column, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k), ExpressionEncoder[Scored]())
    df.groupBy(groupCol)
      .agg(topk(col("score"), col("id")).as("top"))
      .select(groupCol, posexplode(col("top")))
      .select(groupCol, col("col.id").as("id"), col("col.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
