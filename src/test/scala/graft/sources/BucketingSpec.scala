package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Proof that bucketed layout elides the join shuffle: the same
  * orders⋈lineitem aggregation plans WITH an Exchange from plain
  * parquet and WITHOUT one from bucketed tables.
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed orders⋈lineitem joins without a shuffle; results unchanged") {
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft-bucketed").toString
    // force the sort-merge path: broadcast would trivially hide the
    // exchange question, AQE re-plans mid-flight
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")

      Bucketing.writeBucketed(orders, "orders_b", s"$base/orders", "o_orderkey", 4)
      Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", s"$base/lineitem", "o_orderkey", 4)

      def revenueByStatus(o: org.apache.spark.sql.DataFrame,
                          l: org.apache.spark.sql.DataFrame) =
        o.join(l, "o_orderkey")
          .groupBy("o_orderstatus")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy("o_orderstatus")

      val plain = revenueByStatus(orders,
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"))
      val bucketed = revenueByStatus(spark.table("orders_b"), spark.table("lineitem_b"))

      // plain: both join inputs shuffle + the aggregation shuffles = 3;
      // bucketed: only the aggregation shuffles = 1
      assert(Bucketing.countExchanges(plain) == 3,
        s"plain plan:\n${plain.queryExecution.executedPlan}")
      assert(Bucketing.countExchanges(bucketed) == 1,
        s"bucketed plan should only shuffle for the final agg:\n${bucketed.queryExecution.executedPlan}")
      assert(plain.collect().toSeq == bucketed.collect().toSeq)
    } finally {
      Bucketing.dropTable(spark, "orders_b")
      Bucketing.dropTable(spark, "lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
