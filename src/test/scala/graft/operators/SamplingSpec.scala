package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SamplingSpec extends AnyFunSuite with SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
  }

  test("sampleN: deterministic, partitioning-independent") {
    val a = Sampling.sampleN(corpus, col("id"), 50).collect().map(_.getLong(0)).sorted
    val b = Sampling.sampleN(corpus.repartition(13), col("id"), 50)
      .collect().map(_.getLong(0)).sorted
    assert(a.length == 50 && a.sameElements(b))
    // a different salt redraws the sample
    val c = Sampling.sampleN(corpus, col("id"), 50, salt = "other")
      .collect().map(_.getLong(0)).sorted
    assert(!a.sameElements(c))
  }

  test("sampleNPerGroup: exact per-group counts, short groups kept whole") {
    import spark.implicits._
    val withTiny = corpus.union(Seq((9999L, "tiny")).toDF("id", "grp"))
    val out = Sampling.sampleNPerGroup(withTiny, col("grp"), col("id"), nPer = 7)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("g0" -> 7L, "g1" -> 7L, "g2" -> 7L, "g3" -> 7L, "tiny" -> 1L))
  }

  test("mixtureSample: rates respected within tolerance, zero/unknown drop") {
    val rates = Map("g0" -> 100, "g1" -> 50, "g2" -> 0)
    val kept = Sampling.mixtureSample(corpus, col("grp"), col("id"), rates)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("g0") == 250L)                    // rate 100 keeps all
    assert(!kept.contains("g2"))                  // rate 0 drops all
    assert(!kept.contains("g3"))                  // unlisted defaults to 0
    // 250 rows at 50%: binomial(250, .5) stays within ±4σ ≈ ±32
    assert(math.abs(kept("g1") - 125L) <= 32, s"g1 kept ${kept("g1")}")
  }

  test("mixtureSample: deterministic and a pure narrow filter (no shuffle)") {
    val rates = Map("g0" -> 40, "g1" -> 70)
    val df = Sampling.mixtureSample(corpus, col("grp"), col("id"), rates)
    val a = df.collect().map(_.getLong(0)).sorted
    val b = Sampling.mixtureSample(corpus.repartition(7), col("grp"), col("id"), rates)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "mixture sampling must not shuffle")
  }

  test("weightedSample: keep rate tracks the per-row weight; clamps; deterministic") {
    import spark.implicits._
    // four weight bands: 0 ppm, 250k, 750k, and an over-range 2e6 (clamps to 1e6)
    val rows = (0L until 4000L).map(i => (i, (i % 4) match {
      case 0 => 0L
      case 1 => 250000L
      case 2 => 750000L
      case _ => 2000000L
    })).toDF("id", "ppm")
    val kept = Sampling.weightedSample(rows, col("id"), col("ppm"))
      .groupBy("ppm").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!kept.contains(0L), "zero weight must drop everything")
    assert(kept(2000000L) === 1000L, "over-range weight clamps to keep-all")
    // 1000 draws per band, expect p*1000 ± 4σ (σ = sqrt(1000·p·(1-p)))
    assert(math.abs(kept(250000L) - 250.0) < 4 * math.sqrt(1000 * 0.25 * 0.75))
    assert(math.abs(kept(750000L) - 750.0) < 4 * math.sqrt(1000 * 0.75 * 0.25))
    // partitioning invariance
    val a = Sampling.weightedSample(rows, col("id"), col("ppm"))
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.weightedSample(rows.repartition(11), col("id"), col("ppm"))
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("temperatureSample: alpha=1 keeps all, smallest group always whole") {
    import spark.implicits._
    // skewed groups: big=1000, mid=200, small=50
    val skewed = ((0L until 1000L).map(i => (i, "big")) ++
      (1000L until 1200L).map(i => (i, "mid")) ++
      (1200L until 1250L).map(i => (i, "small"))).toDF("id", "grp")
    val all = Sampling.temperatureSample(skewed, col("grp"), col("id"), alpha = 1.0)
    assert(all.count() == 1250L, "alpha=1 is the identity mixture")
    for (alpha <- Seq(0.0, 0.3, 0.7)) {
      val kept = Sampling.temperatureSample(skewed, col("grp"), col("id"), alpha)
        .groupBy("grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(kept("small") == 50L, s"alpha=$alpha must keep the min group whole")
    }
  }

  test("temperatureSample: alpha=0 equalizes expected group masses") {
    import spark.implicits._
    val skewed = ((0L until 1000L).map(i => (i, "big")) ++
      (1000L until 1200L).map(i => (i, "mid")) ++
      (1200L until 1250L).map(i => (i, "small"))).toDF("id", "grp")
    val kept = Sampling.temperatureSample(skewed, col("grp"), col("id"), alpha = 0.0)
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every group's expected kept mass is n_min = 50; ±4σ binomial slack
    assert(math.abs(kept("big") - 50.0) <= 4 * math.sqrt(1000 * 0.05 * 0.95),
      s"big kept ${kept("big")}")
    assert(math.abs(kept("mid") - 50.0) <= 4 * math.sqrt(200 * 0.25 * 0.75),
      s"mid kept ${kept("mid")}")
    assert(kept("small") == 50L)
  }

  test("temperatureSample: deterministic across partitionings") {
    val a = Sampling.temperatureSample(corpus, col("grp"), col("id"), 0.5)
      .collect().map(_.getLong(0)).sorted
    val b = Sampling.temperatureSample(corpus.repartition(9), col("grp"), col("id"), 0.5)
      .collect().map(_.getLong(0)).sorted
    assert(a.length > 0 && a.sameElements(b))
  }
}
