package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Skew handling both ways: the pre-planned salted join produces
  * identical results to the plain join while spreading the hot key,
  * and AQE's runtime skew splitting kicks in on a skewed sort-merge
  * join (the 100 TB default when the skew is NOT known in advance).
  */
class SkewSpec extends AnyFunSuite with SparkSpec {

  // ~90% of left rows share key 0; right is a 50-row dimension
  private def skewed = {
    val left = spark.range(0, 100000).select(
      when(pmod(col("id"), lit(10)) === 0, pmod(col("id"), lit(50)))
        .otherwise(lit(0L)).as("k"),
      col("id").as("payload"))
    val right = spark.range(0, 50).select(col("id").as("k"), (col("id") * 2).as("w"))
    (left, right)
  }

  test("a pre-existing __salt column is rejected, not silently overwritten") {
    val (left, right) = skewed
    val poisoned = left.withColumn("__salt", lit(7L))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(poisoned, right, "k", col("payload"))
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, right.withColumn("__salt", lit(7L)), "k", col("payload"))
    }
  }

  test("saltedJoin equals the plain join") {
    val (left, right) = skewed
    val plain  = left.join(right, "k")
    val salted = Skew.saltedJoin(left, right, "k", col("payload"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads the hot key across reducers") {
    val (left, _) = skewed
    val salted = left.withColumn("__salt", pmod(xxhash64(col("payload")), lit(8)))
    val perSalt = salted.where(col("k") === 0L)
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(perSalt.length == 8, "hot key must hit every salt bucket")
    val (mx, mn) = (perSalt.max, perSalt.min)
    assert(mx < mn * 2, s"salt buckets should be balanced, got min=$mn max=$mx")
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // skew detection compares against the MEDIAN partition size — with
      // the suite default of 2 partitions the hot partition IS the
      // median; use enough reducers that the median is a cold partition
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // local-mode-sized thresholds: the hot partition (~MBs) must
      // count as skewed and split into advisory-sized pieces
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // both sides large-by-config so the join stays sort-merge
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val (left, right) = skewed
      val joined = left.join(right, "k")
      // collect THIS DataFrame (not a derived count) so its own
      // adaptive plan finalizes and records the skew split
      assert(joined.collect().length == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected AQE skew handling in the final plan:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
