package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FunnelSpec extends AnyFunSuite with SparkSpec {

  private def ev = {
    import spark.implicits._
    Seq(
      // user 1 completes the funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase BEFORE the click — stage 3 must not count
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // user 3: clicked before ever viewing; views later with no
      // post-view click — only stage 1
      (3L, 10L, "click"), (3L, 20L, "view"),
      // user 4 never views — absent from the output
      (4L, 10L, "click"), (4L, 20L, "purchase")
    ).toDF("user_id", "ts", "et")
  }

  test("stages complete only in strict ts order; non-starters are absent") {
    val out = Funnel.stages(ev, col("user_id"), col("ts"), col("et"),
        Seq("view", "click", "purchase"))
      .orderBy("entity").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, 20L, 30L, 3),
      (2L, 10L, 30L, null, 2),   // the ts=20 purchase precedes the click
      (3L, 20L, null, null, 1))) // pre-view click does not count
  }

  test("greedy min is optimal: an earlier stage-1 unlocks a completion") {
    import spark.implicits._
    // view at 10 and 40; click at 20. Choosing the LATER view (40)
    // would miss the click — the greedy earliest view must not
    val df = Seq((1L, 40L, "view"), (1L, 10L, "view"), (1L, 20L, "click"))
      .toDF("user_id", "ts", "et")
    val out = Funnel.stages(df, col("user_id"), col("ts"), col("et"),
        Seq("view", "click")).collect().head
    assert((out.getLong(1), out.getLong(2), out.getInt(3)) == ((10L, 20L, 2)))
  }

  test("windowed funnel: stages beyond the horizon don't count") {
    import spark.implicits._
    val df = Seq(
      // user 1: full chain inside the horizon (anchor 10, H=25)
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click lands at anchor+30 > horizon — only stage 1
      (2L, 10L, "view"), (2L, 40L, "click"),
      // user 3: in-horizon click at 20, purchase at 36 just outside
      (3L, 10L, "view"), (3L, 20L, "click"), (3L, 36L, "purchase")
    ).toDF("user_id", "ts", "et")
    val out = Funnel.stagesWindowed(df, col("user_id"), col("ts"), col("et"),
        Seq("view", "click", "purchase"), horizon = 25L)
      .orderBy("entity").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, 20L, 30L, 3),   // 30 <= 10+25? no — wait, 30 <= 35 ✓
      (2L, 10L, null, null, 1), // click at 40 > 35
      (3L, 10L, 20L, null, 2))) // purchase at 36 > 35
  }

  test("windowed funnel anchors at the earliest stage-1 event") {
    import spark.implicits._
    // views at 10 and 100; click at 105. Anchor = 10, horizon 20 —
    // the click is outside [10, 30] even though it's within 20 of the
    // LATER view (documented anchoring semantics)
    val df = Seq((1L, 10L, "view"), (1L, 100L, "view"), (1L, 105L, "click"))
      .toDF("user_id", "ts", "et")
    val out = Funnel.stagesWindowed(df, col("user_id"), col("ts"), col("et"),
        Seq("view", "click"), horizon = 20L).collect().head
    assert((out.getLong(1), out.get(2), out.getInt(3)) == ((10L, null, 1)))
  }

  test("funnel is join+aggregate shaped: no window, map-side partials") {
    val plan = Funnel.stages(ev, col("user_id"), col("ts"), col("et"),
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window allowed:\n$plan")
    assert(plan.contains("partial_min"), s"two-phase min expected:\n$plan")
  }
}
