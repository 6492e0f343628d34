package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UpsertSpec extends AnyFunSuite with SparkSpec {

  private def base = {
    import spark.implicits._
    Seq(
      (1L, 1L, "en", "one"),
      (2L, 1L, "en", "two"),
      (3L, 1L, "de", "drei")).toDF("k", "version", "lang", "text")
  }

  private def updates = {
    import spark.implicits._
    Seq(
      (2L, 3L, "en", "two-v3"),
      (2L, 2L, "en", "two-v2"),   // superseded by v3 in the same batch
      (4L, 2L, "fr", "quatre")    // brand-new key (insert path)
    ).toDF("k", "version", "lang", "text")
  }

  test("latest-wins across base, superseded updates, and inserts") {
    val out = Upsert.latestByKey(base, updates, "k", "version",
        Seq("lang", "text"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, "en", "one"),        // untouched base row
      (2L, 3L, "en", "two-v3"),     // highest of three versions
      (3L, 1L, "de", "drei"),
      (4L, 2L, "fr", "quatre")))    // pure insert
  }

  test("snapshot diff classifies added, removed, and changed; drops overlap") {
    import spark.implicits._
    val curr = Seq(
      (1L, "en", "one"),          // unchanged → dropped
      (2L, "en", "two CHANGED"),  // payload differs
      (5L, "it", "cinque"))       // new key
    .toDF("k", "lang", "text")
    val out = Upsert.snapshotDiff(base.drop("version"), curr, "k",
        Seq("lang", "text"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((2L, "changed"), (3L, "removed"), (5L, "added")))
  }

  test("snapshot diff treats null payload fields null-safely") {
    import spark.implicits._
    val a = Seq((1L, null.asInstanceOf[String]), (2L, "x"))
      .toDF("k", "text")
    val b = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("k", "text")
    val out = Upsert.snapshotDiff(a, b, "k", Seq("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // null == null per null-safe compare → key 1 unchanged (dropped);
    // key 2 went x → null → changed
    assert(out.toSeq == Seq((2L, "changed")))
  }

  test("applyCdc: delete tombstones win, out-of-order feed, base survives") {
    import spark.implicits._
    val changes = Seq(
      (2L, 2L, "U", "en", "two-v2"),
      (2L, 3L, "D", "en", "two-v2"),  // delete AFTER the update: key gone
      (3L, 2L, "D", "de", "drei"),
      (3L, 3L, "U", "de", "drei-back"), // re-insert after delete: alive
      (4L, 1L, "I", "fr", "quatre"))  // brand-new key
      .toDF("k", "v", "op", "lang", "text")
    val out = Upsert.applyCdc(
        base.select(col("k"), col("lang"), col("text")), changes,
        "k", "v", "op", Seq("lang", "text"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(3))).toSeq
    assert(out == Seq(
      (1L, None, "one"),            // untouched base: NULL version
      (3L, Some(3L), "drei-back"),  // delete superseded by later update
      (4L, Some(1L), "quatre")))    // insert
    // same scale contract as latestByKey: no window, map-side combine
    val plan = Upsert.applyCdc(
      base.select(col("k"), col("lang"), col("text")), changes,
      "k", "v", "op", Seq("lang", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && plan.contains("partial"),
      s"one partial-friendly aggregate expected:\n$plan")
  }

  test("applyCdc: a NULL-setting update wins with NULL; sentinel versions rejected") {
    import spark.implicits._
    // an update that nulls a payload column must STICK (bare arg_max
    // in the oracle would skip the NULL and resurrect the stale text —
    // the struct-wrapped winner semantics both engines now share)
    val changes = Seq((1L, 5L, "U", "en", null.asInstanceOf[String]))
      .toDF("k", "v", "op", "lang", "text")
    val out = Upsert.applyCdc(
        base.select(col("k"), col("lang"), col("text")), changes,
        "k", "v", "op", Seq("lang", "text"))
      .where(col("k") === 1L).collect().head
    assert(out.getLong(1) == 5L && out.isNullAt(3),
      s"NULL payload from the winning change must survive: $out")
    // a change version equal to the Long.MinValue base sentinel would
    // tie with base rows — rejected loudly, not silently misfolded
    val bad = Seq((1L, Long.MinValue, "U", "en", "boom"))
      .toDF("k", "v", "op", "lang", "text")
    val e = intercept[Exception] {
      Upsert.applyCdc(base.select(col("k"), col("lang"), col("text")),
        bad, "k", "v", "op", Seq("lang", "text")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("sentinel") ||
      e.getCause != null && e.getCause.getMessage.contains("sentinel"),
      s"sentinel guard must fire: $e")
  }

  test("compaction is one partial-friendly aggregate, not a window") {
    val plan = Upsert.latestByKey(base, updates, "k", "version",
      Seq("lang", "text")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window-free contract:\n$plan")
    // two-phase agg: a partial aggregate below the key exchange
    assert(plan.contains("partial"), s"map-side combine expected:\n$plan")
  }
}
