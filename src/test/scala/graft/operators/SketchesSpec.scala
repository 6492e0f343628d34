package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SketchesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def keys(n: Int, tag: String) =
    (0 until n).map(i => ("g", s"$tag$i")).toDF("grp", "key")

  test("small-range (linear-counting) estimate within 3% at 5k distinct") {
    // Duplicates must not move the estimate: union the stream with itself.
    val df = keys(5000, "k").unionAll(keys(5000, "k"))
    val row = Sketches.hllEstimate(df, col("grp"), col("key")).head()
    val est = row.getAs[Double]("hll_est")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.03, s"est=$est")
  }

  test("raw-regime estimate within 5% at 50k distinct") {
    val row = Sketches.hllEstimate(keys(50000, "r"), col("grp"), col("key")).head()
    val est = row.getAs[Double]("hll_est")
    assert(math.abs(est - 50000.0) / 50000.0 < 0.05, s"est=$est")
  }

  test("register state merges commutatively (shards == whole)") {
    val all = keys(2000, "m")
    val half1 = all.where(expr("cast(substring(key, 2) as int) % 2 = 0"))
    val half2 = all.where(expr("cast(substring(key, 2) as int) % 2 = 1"))
    val whole = Sketches.hllRegisters(all, col("grp"), col("key"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val merged = Sketches.hllRegisters(half1, col("grp"), col("key"))
      .unionAll(Sketches.hllRegisters(half2, col("grp"), col("key")))
      .groupBy("grp", "reg").agg(max("mx").as("mx"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    assert(whole == merged)
  }

  test("estimate is partitioning-invariant") {
    val df = keys(3000, "p")
    val a = Sketches.hllEstimate(df, col("grp"), col("key")).head()
    val b = Sketches.hllEstimate(df.repartition(7, col("key")),
      col("grp"), col("key")).head()
    assert(a.getAs[Double]("hll_est") == b.getAs[Double]("hll_est"))
    assert(a.getAs[Long]("s_int") == b.getAs[Long]("s_int"))
  }

  test("CMS never undercounts and is exact absent collisions") {
    // Zipf-ish stream: term_i appears (50 - i) times.
    val rows = (0 until 50).flatMap(i => Seq.fill(50 - i)(s"t$i")).toDF("key")
    val probes = (0 until 10).map(i => s"t$i").toDF("term")
    val est = Sketches.cmsEstimate(rows, col("key"), probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 10).foreach { i =>
      val exact = 50L - i
      val e = est(s"t$i")
      assert(e >= exact, s"t$i undercounted: $e < $exact")
      // 500 tokens into 4×4096 counters: collisions are possible but
      // the min-over-depth estimate must stay within the CM bound
      // εn = (e/w)·n ≈ 0.33 — i.e. exact at this scale.
      assert(e == exact, s"t$i overcounted at trivial load: $e != $exact")
    }
  }

  test("CMS probes absent from the corpus estimate 0, not min-over-collisions") {
    // an absent term's buckets may still carry collision counts from
    // corpus terms; any EMPTY bucket must read as counter 0, making
    // the min-over-depth estimate 0 (the correct CMS answer), and the
    // probe row must survive the join
    val rows = (0 until 50).flatMap(i => Seq.fill(50 - i)(s"t$i")).toDF("key")
    val probes = Seq("t0", "never-in-corpus-1", "never-in-corpus-2").toDF("term")
    val est = Sketches.cmsEstimate(rows, col("key"), probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet ==
      Set("t0", "never-in-corpus-1", "never-in-corpus-2"))
    assert(est("t0") == 50L)
    // 500 tokens in 4×4096 counters: odds of ALL 4 of an absent term's
    // buckets colliding are negligible; these fixed probes hit an
    // empty bucket and must estimate exactly 0
    assert(est("never-in-corpus-1") == 0L, est.toString)
    assert(est("never-in-corpus-2") == 0L, est.toString)
  }

  test("CMS sketch is bounded by depth×width rows") {
    val rows = (0 until 20000).map(i => s"u$i").toDF("key")
    val n = Sketches.cmsSketch(rows, col("key")).count()
    assert(n <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
  }

  test("log-bucket quantiles: lower bound within 2^-subBits of the exact rank value") {
    // heavy-tailed deterministic values exercise many octaves
    val vals = (1 to 20000).map(i => (i.toLong * i * 7 + i) % 9999991L)
    val df = vals.toDF("v")
    val qs = Seq(0.1, 0.5, 0.9, 0.99, 1.0)
    val est = Sketches.logQuantiles(df, col("v"), qs, subBits = 6)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val exact = sorted(math.max(0, math.ceil(q * sorted.length).toInt - 1))
      val lb = est(q)
      assert(lb <= exact, s"q=$q: lower bound $lb above exact $exact")
      assert(exact - lb <= exact / 64.0 + 1,
        s"q=$q: bound $lb misses exact $exact by more than 2^-6 relative")
    }
  }

  test("log-bucket quantiles are partitioning-invariant (mergeable state)") {
    val vals = (1 to 5000).map(i => (i.toLong * 31 + 7) % 100000L)
    val one = Sketches.logQuantiles(vals.toDF("v").coalesce(1), col("v"),
      Seq(0.5, 0.95)).collect().map(_.toSeq).toSeq
    val many = Sketches.logQuantiles(vals.toDF("v").repartition(17), col("v"),
      Seq(0.5, 0.95)).collect().map(_.toSeq).toSeq
    assert(one == many)
  }

  test("grouped quantiles equal the per-group global sketch, stay bounded") {
    // three groups with disjoint scales so per-group answers differ
    val rows = (1 to 3000).map { i =>
      val g = s"g${i % 3}"
      val v = ((i.toLong * i * 13 + i) % 99991L) * (1L << (4 * (i % 3)))
      (g, v)
    }
    val df = rows.toDF("grp", "v")
    val qs = Seq(0.5, 0.9)
    val grouped = Sketches.logQuantilesBy(df, "grp", col("v"), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2))
      .toMap
    assert(grouped.size == 3 * qs.size)
    // ground truth: run the GLOBAL sketch on each group's slice — the
    // grouped variant must be exactly that, computed in one pass
    rows.groupBy(_._1).foreach { case (g, slice) =>
      val solo = Sketches.logQuantiles(
          slice.map(_._2).toDF("v"), col("v"), qs)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      qs.foreach { q =>
        assert(grouped((g, q)) == solo(q),
          s"group $g q=$q: grouped ${grouped((g, q))} != solo ${solo(q)}")
      }
    }
    // state stays bounded at groups × bucket cap
    val state = Sketches.bucketCountsBy(df, "grp", col("v"))
    assert(state.count() <= 3L * 64 * 128)
    // and the grouped state merges partitioning-invariantly too
    val many = Sketches.logQuantilesBy(df.repartition(17), "grp",
      col("v"), qs).collect().map(_.toSeq).toSeq
    val oneP = Sketches.logQuantilesBy(df.coalesce(1), "grp",
      col("v"), qs).collect().map(_.toSeq).toSeq
    assert(many == oneP)
  }
}
