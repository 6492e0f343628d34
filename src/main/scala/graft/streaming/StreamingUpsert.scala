package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous latest-wins compaction — the streaming counterpart of
  * [[graft.operators.Upsert.latestByKey]]: a stream of versioned rows
  * folds into a per-key latest snapshot as a STREAMING AGGREGATION,
  * not custom state code. `max`/`max_by` are declarative aggregates,
  * so Spark's state store holds exactly one (version, payload)
  * candidate per live key — the minimum any latest-wins semantics can
  * hold — with partial aggregation compacting each micro-batch before
  * the shuffle, the same two-phase shape as the batch operator.
  *
  * Output-mode contract: in `update` mode the sink receives only the
  * keys whose latest row CHANGED in the trigger — the natural feed
  * for an upsert-capable store (the production shape). `complete`
  * mode re-emits the full compacted snapshot per trigger — the
  * harness/verification shape. State is ∝ live keys in both (a
  * latest-wins table cannot be smaller); callers with key churn
  * bound it upstream by partitioning the key space, not by watermark
  * — version order, unlike event time, has no horizon.
  */
object StreamingUpsert {

  /** Fold a versioned stream into latest-per-key. Same column
    * contract as the batch operator: `(key, version, payload…)` in,
    * one row per key out. Ties on version are caller-excluded
    * (unique versions per key), as in the batch form.
    */
  def latestByKey(stream: DataFrame, keyCol: String, versionCol: String,
                  payloadCols: Seq[String]): DataFrame =
    stream.groupBy(col(keyCol))
      .agg(max(col(versionCol)).as(versionCol),
        payloadCols.map(c => max_by(col(c), col(versionCol)).as(c)): _*)
}
