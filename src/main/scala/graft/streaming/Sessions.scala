package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY §8 round-2 candidates: richer
  * streaming): event-time session windows via `flatMapGroupsWithState`
  * and a watermarked stream-stream attribution join. The reference has
  * no streaming surface at all (SURVEY §2.7) — these are the engine's
  * incremental counterparts of the batch `q_events_sessionize` /
  * `q_events_asof_join` queries.
  *
  * Scale design: state is one small record per ACTIVE key (user), not
  * per event — the state store holds the open session only, closed
  * sessions are emitted and dropped. The watermark bounds both state
  * retention (timeouts purge idle users) and the join buffer in
  * [[attributedPurchases]]; without it, stream-stream joins buffer
  * forever.
  */
object Sessions {

  /** One input event: `ts` must be an event-time timestamp column. */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** State per active user: the currently-open session. */
  final case class OpenSession(startMs: Long, lastMs: Long,
                               nEvents: Long, totalValue: Double)

  /** One closed session (gap-terminated or timed out by watermark). */
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp,
                              n_events: Long, total_value: Double)

  /** Gap-based sessionization: a session closes when its user is idle
    * past `gapMinutes` — either observed directly (next event arrives
    * beyond the gap) or enforced by an event-time timeout when the
    * watermark passes `last event + gap` with no successor. Same gap
    * semantics as the batch window query (`new_session` on gap >
    * 30 min), evaluated incrementally.
    *
    * Input must carry (user_id, ts, value); `watermarkDelay` is how
    * much event-time disorder the stream tolerates before a session
    * can close.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          def closed(o: OpenSession): SessionOut =
            SessionOut(user, new java.sql.Timestamp(o.startMs),
              new java.sql.Timestamp(o.lastMs), o.nEvents, o.totalValue)

          if (state.hasTimedOut) {
            // watermark passed lastMs + gap with no successor event
            val out = state.getOption.map(closed).toSeq
            state.remove()
            out.iterator
          } else {
            // Interval merge over (open session ∪ batch events), in
            // start order: events within one micro-batch may arrive
            // unordered, and a late event (inside the watermark) may
            // even predate the open session's start — merging as
            // intervals extends the session BACKWARD in that case
            // (min start / max end), keeping emitted bounds identical
            // to the batch sessionizer's on the same event set.
            val intervals =
              (state.getOption.toSeq ++
                it.map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1L, e.value)))
                .sortBy(s => (s.startMs, s.lastMs, s.totalValue))
            val out = ArrayBuffer.empty[SessionOut]
            var open: Option[OpenSession] = None
            intervals.foreach { iv =>
              open match {
                case Some(o) if iv.startMs - o.lastMs <= gapMs =>
                  open = Some(OpenSession(math.min(o.startMs, iv.startMs),
                    math.max(o.lastMs, iv.lastMs),
                    o.nEvents + iv.nEvents, o.totalValue + iv.totalValue))
                case Some(o) =>
                  out += closed(o)
                  open = Some(iv)
                case None =>
                  open = Some(iv)
              }
            }
            open.foreach { o =>
              state.update(o)
              // timeout must sit above the current watermark; if the
              // open session is already older than the watermark the
              // next batch's timeout sweep closes it immediately
              state.setTimeoutTimestamp(
                math.max(o.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Watermarked stream-stream join: each purchase attributed to every
    * view by the same user in the preceding `windowMinutes`. The time
    * bound plus both watermarks let Spark purge the join buffers — the
    * state-retention contract that makes a stream-stream join runnable
    * indefinitely.
    */
  def attributedPurchases(views: DataFrame, purchases: DataFrame,
                          windowMinutes: Int = 30,
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("user_id").cast("long").as("v_user"),
        col("ts").cast("timestamp").as("v_ts"),
        col("value").cast("double").as("view_value"))
      .withWatermark("v_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").cast("long").as("p_user"),
        col("ts").cast("timestamp").as("p_ts"),
        col("value").cast("double").as("purchase_value"))
      .withWatermark("p_ts", watermarkDelay)
    v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("v_ts"), col("p_ts"),
        col("view_value"), col("purchase_value"))
  }
}
