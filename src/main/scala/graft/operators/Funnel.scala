package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — per entity, the first completion time of
  * each stage STRICTLY AFTER the previous stage's completion
  * (view → click → purchase and friends): the standard product-
  * analytics question a sessionize/window pass does not answer,
  * because stage k only counts when it happens after the entity's
  * chosen stage-(k−1) event, not merely inside the same session (no
  * reference analog; §2.7 events-family extension).
  *
  * Semantics: stage 1 = the entity's earliest stage-1 event; stage k =
  * the earliest stage-k event with `ts > ts_{k−1}`. Taking the MINIMUM
  * at every step is the standard greedy funnel and is OPTIMAL: an
  * earlier stage-(k−1) completion can only admit more stage-k
  * candidates, so the greedy choice dominates any other assignment.
  * Entities with no stage-1 event are absent (aggregate semantics);
  * unreached later stages are null, `reached` counts completed stages.
  *
  * Scale shape: one filtered aggregate per stage (map-side partial
  * combine on the entity key) plus one equi-join per stage against the
  * previous frontier — no windows, no per-entity event collection, no
  * ordered state; cost ∝ events of the funnel's types, state ∝
  * entities that started the funnel. Timestamps compare as exact
  * integers (epoch nanos), so both engines pick identical rows.
  */
object Funnel {

  /** Per-entity stage completion times for `funnel` (ordered stage
    * labels, ≥ 1). Output: (entity, ts_1 … ts_n, reached).
    */
  def stages(df: DataFrame, entityCol: Column, tsCol: Column,
             typeCol: Column, funnel: Seq[String]): DataFrame = {
    require(funnel.nonEmpty, "funnel must have at least one stage")
    require(funnel.distinct.size == funnel.size, "stages must be distinct")
    val ev = df.select(entityCol.as("entity"), tsCol.as("ts"),
      typeCol.as("et"))
    var acc = ev.where(col("et") === funnel.head)
      .groupBy("entity").agg(min("ts").as("ts_1"))
    for ((st, i) <- funnel.tail.zipWithIndex) {
      val k = i + 2
      val nxt = ev.where(col("et") === st)
        .join(acc.select(col("entity"), col(s"ts_${k - 1}")), "entity")
        .where(col("ts") > col(s"ts_${k - 1}"))
        .groupBy("entity").agg(min("ts").as(s"ts_$k"))
      acc = acc.join(nxt, Seq("entity"), "left")
    }
    val reached = funnel.indices
      .map(i => when(col(s"ts_${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.select(col("entity") +:
      funnel.indices.map(i => col(s"ts_${i + 1}")) :+
      reached.cast("int").as("reached"): _*)
  }

  /** Time-boxed funnel — [[stages]] with a completion horizon: stage k
    * must land strictly after stage k−1 AND within `horizon` of the
    * entity's stage-1 time (the common product-analytics form: "did
    * the user purchase within 2 h of the first view?").
    *
    * Anchoring: the window opens at the entity's EARLIEST stage-1
    * event — deterministic and O(1) state per entity. (A sliding
    * variant that searches every stage-1 occurrence for the best
    * chain needs per-entity event retention; this form keeps the
    * aggregate+join shape, and re-anchoring is a caller-side filter
    * on the stage-1 events before calling.) Greedy-min stays optimal
    * given the anchor: the horizon bound is fixed once ts_1 is, so an
    * earlier stage-(k−1) completion still only admits more stage-k
    * candidates. `horizon` is in `tsCol`'s unit (epoch nanos for the
    * harness events table).
    */
  def stagesWindowed(df: DataFrame, entityCol: Column, tsCol: Column,
                     typeCol: Column, funnel: Seq[String],
                     horizon: Long): DataFrame = {
    require(funnel.nonEmpty, "funnel must have at least one stage")
    require(funnel.distinct.size == funnel.size, "stages must be distinct")
    require(horizon > 0, "horizon must be positive")
    val ev = df.select(entityCol.as("entity"), tsCol.as("ts"),
      typeCol.as("et"))
    var acc = ev.where(col("et") === funnel.head)
      .groupBy("entity").agg(min("ts").as("ts_1"))
    for ((st, i) <- funnel.tail.zipWithIndex) {
      val k = i + 2
      val carry =
        if (k == 2) acc.select(col("entity"), col("ts_1"))
        else acc.select(col("entity"), col("ts_1"), col(s"ts_${k - 1}"))
      val nxt = ev.where(col("et") === st)
        .join(carry, "entity")
        .where(col("ts") > col(s"ts_${k - 1}") &&
          col("ts") <= col("ts_1") + lit(horizon))
        .groupBy("entity").agg(min("ts").as(s"ts_$k"))
      acc = acc.join(nxt, Seq("entity"), "left")
    }
    val reached = funnel.indices
      .map(i => when(col(s"ts_${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.select(col("entity") +:
      funnel.indices.map(i => col(s"ts_${i + 1}")) :+
      reached.cast("int").as("reached"): _*)
  }

  /** DuckDB twin of [[stagesWindowed]] over a FROM-able relation
    * exposing (entity, ts, et).
    */
  def stagesWindowedSql(fromSql: String, funnel: Seq[String],
                        horizon: Long): String = {
    require(funnel.nonEmpty, "funnel must have at least one stage")
    def q(s: String) = s.replace("'", "''")
    val steps = funnel.tail.zipWithIndex.map { case (st, i) =>
      val k = i + 2
      s"""s$k AS MATERIALIZED (
         |  SELECT e.entity, min(e.ts) AS ts_$k
         |  FROM ev e JOIN s${k - 1} p ON e.entity = p.entity
         |       JOIN s1 a ON e.entity = a.entity
         |  WHERE e.et = '${q(st)}' AND e.ts > p.ts_${k - 1}
         |    AND e.ts <= a.ts_1 + $horizon
         |  GROUP BY 1)""".stripMargin
    }
    val joins = (2 to funnel.size)
      .map(k => s"LEFT JOIN s$k USING (entity)").mkString(" ")
    val tsCols = (1 to funnel.size).map(k => s"ts_$k").mkString(", ")
    val reached = (1 to funnel.size)
      .map(k => s"CASE WHEN ts_$k IS NULL THEN 0 ELSE 1 END")
      .mkString(" + ")
    s"""WITH ev AS MATERIALIZED (SELECT entity, ts, et FROM ($fromSql)),
       |s1 AS MATERIALIZED (
       |  SELECT entity, min(ts) AS ts_1 FROM ev
       |  WHERE et = '${q(funnel.head)}' GROUP BY 1)${
        if (steps.nonEmpty) steps.mkString(",\n", ",\n", "") else ""}
       |SELECT entity, $tsCols, CAST($reached AS INTEGER) AS reached
       |FROM s1 $joins""".stripMargin
  }

  /** DuckDB twin of [[stages]] over a FROM-able relation exposing
    * (entity, ts, et).
    */
  def stagesSql(fromSql: String, funnel: Seq[String]): String = {
    require(funnel.nonEmpty, "funnel must have at least one stage")
    def q(s: String) = s.replace("'", "''")
    val steps = funnel.tail.zipWithIndex.map { case (st, i) =>
      val k = i + 2
      s"""s$k AS MATERIALIZED (
         |  SELECT e.entity, min(e.ts) AS ts_$k
         |  FROM ev e JOIN s${k - 1} p ON e.entity = p.entity
         |  WHERE e.et = '${q(st)}' AND e.ts > p.ts_${k - 1}
         |  GROUP BY 1)""".stripMargin
    }
    val joins = (2 to funnel.size)
      .map(k => s"LEFT JOIN s$k USING (entity)").mkString(" ")
    val tsCols = (1 to funnel.size).map(k => s"ts_$k").mkString(", ")
    val reached = (1 to funnel.size)
      .map(k => s"CASE WHEN ts_$k IS NULL THEN 0 ELSE 1 END")
      .mkString(" + ")
    s"""WITH ev AS MATERIALIZED (SELECT entity, ts, et FROM ($fromSql)),
       |s1 AS MATERIALIZED (
       |  SELECT entity, min(ts) AS ts_1 FROM ev
       |  WHERE et = '${q(funnel.head)}' GROUP BY 1)${
        if (steps.nonEmpty) steps.mkString(",\n", ",\n", "") else ""}
       |SELECT entity, $tsCols, CAST($reached AS INTEGER) AS reached
       |FROM s1 $joins""".stripMargin
  }
}
