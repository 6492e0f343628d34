package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.Components

class StreamingClustersSpec extends AnyFunSuite with SparkSpec {

  test("streamed edge batches converge to the full-recompute clustering") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val maintainer = new ClusterMaintainer(spark)
    val ms = MemoryStream[(Long, Long)]
    val q = maintainer.attach(ms.toDS().toDF("id_a", "id_b"))
      .outputMode("append").start()
    try {
      // batch 1: two separate clusters
      ms.addData((1L, 2L), (10L, 11L))
      q.processAllAvailable()
      // batch 2: extend one, start another
      ms.addData((2L, 3L), (20L, 21L))
      q.processAllAvailable()
      // batch 3: merge the 1-cluster with the 10-cluster
      ms.addData((3L, 10L))
      q.processAllAvailable()
      val got = maintainer.labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val allEdges = Seq((1L, 2L), (10L, 11L), (2L, 3L), (20L, 21L), (3L, 10L))
      val nodes = allEdges.flatMap(e => Seq(e._1, e._2)).distinct
      val full = Components.connectedComponents(
          nodes.toDF("id"), allEdges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == full, s"maintained $got != recomputed $full")
    } finally q.stop()
  }

  test("maintenance does not accumulate checkpointed blocks across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val before = spark.sparkContext.getPersistentRDDs.size
    val maintainer = new ClusterMaintainer(spark)
    val ms = MemoryStream[(Long, Long)]
    val q = maintainer.attach(ms.toDS().toDF("id_a", "id_b"))
      .outputMode("append").start()
    try {
      for (b <- 0 until 5) {
        ms.addData((b * 10L, b * 10L + 1L))
        q.processAllAvailable()
      }
      val after = spark.sparkContext.getPersistentRDDs.size
      // only the live labels checkpoint may remain
      assert(after - before <= 1,
        s"${after - before} cached RDDs accumulated over 5 batches")
    } finally q.stop()
  }
}
