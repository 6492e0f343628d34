package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class StreamingCurationSpec extends AnyFunSuite with SparkSpec {

  test("per-domain lifetime budget across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long)]
    val out = StreamingCuration.admitWithBudget(
      ms.toDS().toDF("domain", "doc_id", "n_tokens"), maxTokens = 100L)
    val q = out.writeStream.format("memory").queryName("admitted")
      .outputMode("append").start()
    try {
      // batch 1: a admits 40+50; 20 would cross 100 and is rejected
      // (in-batch order is by doc_id, not arrival: 3 sorts before 5)
      ms.addData(("a", 5L, 20L), ("a", 1L, 40L), ("a", 3L, 50L),
        ("b", 2L, 99L))
      q.processAllAvailable()
      val b1 = spark.table("admitted").as[(String, Long, Long, Long)]
        .collect().toSet
      assert(b1 == Set(("a", 1L, 40L, 40L), ("a", 3L, 50L, 90L),
        ("b", 2L, 99L, 99L)), s"got $b1")

      // batch 2: a has 10 left — a doc of 10 fits exactly (inclusive),
      // b has 1 left — a doc of 2 is rejected; state persisted across
      // batches
      ms.addData(("a", 7L, 10L), ("b", 9L, 2L))
      q.processAllAvailable()
      val b2 = spark.table("admitted").as[(String, Long, Long, Long)]
        .collect().toSet
      assert(b2 == b1 + (("a", 7L, 10L, 100L)), s"got $b2")

      // batch 3: a is fully spent — everything rejected
      ms.addData(("a", 8L, 1L))
      q.processAllAvailable()
      assert(spark.table("admitted").count() == 4)
    } finally q.stop()
  }

  test("a too-large document does not close the domain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long)]
    val q = StreamingCuration.admitWithBudget(
        ms.toDS().toDF("domain", "doc_id", "n_tokens"), maxTokens = 50L)
      .writeStream.format("memory").queryName("admitted2")
      .outputMode("append").start()
    try {
      ms.addData(("d", 1L, 60L))   // over budget outright
      q.processAllAvailable()
      ms.addData(("d", 2L, 30L))   // still fits
      q.processAllAvailable()
      val rows = spark.table("admitted2").as[(String, Long, Long, Long)]
        .collect().toSet
      assert(rows == Set(("d", 2L, 30L, 30L)), s"got $rows")
    } finally q.stop()
  }
}
