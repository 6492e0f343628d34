package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Upsert

class StreamingUpsertSpec extends AnyFunSuite with SparkSpec {

  test("streamed latest-wins equals the batch compaction across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq(
      (1L, 1L, "en", "one"),
      (2L, 1L, "en", "two"),
      (3L, 1L, "de", "drei"))
    val updates = Seq(
      (2L, 3L, "en", "two-v3"),
      (2L, 2L, "en", "two-v2"),   // superseded within the same batch
      (4L, 2L, "fr", "quatre"))   // insert
    val ms = MemoryStream[(Long, Long, String, String)]
    val out = StreamingUpsert.latestByKey(
      ms.toDS().toDF("k", "version", "lang", "text"),
      "k", "version", Seq("lang", "text"))
    val q = out.writeStream.format("memory").queryName("upsert_latest")
      .outputMode("complete").start()
    try {
      ms.addData(base); q.processAllAvailable()
      ms.addData(updates); q.processAllAvailable()
      val streamed = spark.table("upsert_latest").orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      val batch = Upsert.latestByKey(
          base.toDF("k", "version", "lang", "text"),
          updates.toDF("k", "version", "lang", "text"),
          "k", "version", Seq("lang", "text"))
        .orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      assert(streamed.toSeq == batch.toSeq)
      assert(streamed.toSeq == Seq(
        (1L, 1L, "en", "one"),
        (2L, 3L, "en", "two-v3"),
        (3L, 1L, "de", "drei"),
        (4L, 2L, "fr", "quatre")))
    } finally q.stop()
  }

  test("update mode emits only changed keys per trigger") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String, String)]
    val out = StreamingUpsert.latestByKey(
      ms.toDS().toDF("k", "version", "lang", "text"),
      "k", "version", Seq("lang", "text"))
    val q = out.writeStream.format("memory").queryName("upsert_updates")
      .outputMode("update").start()
    try {
      ms.addData(Seq((1L, 1L, "en", "one"), (2L, 1L, "en", "two")))
      q.processAllAvailable()
      val afterFirst = spark.table("upsert_updates").count()
      ms.addData(Seq((2L, 2L, "en", "two-v2"))) // only key 2 changes
      q.processAllAvailable()
      val secondTrigger = spark.table("upsert_updates").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
        .drop(afterFirst.toInt)
      assert(secondTrigger.toSeq == Seq((2L, 2L, "two-v2")),
        s"update mode must re-emit only the superseded key, got ${secondTrigger.toSeq}")
    } finally q.stop()
  }
}
