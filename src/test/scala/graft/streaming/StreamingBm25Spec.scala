package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Bucketing
import graft.text.TextAnalysis

class StreamingBm25Spec extends AnyFunSuite with SparkSpec {

  test("index served after streamed appends equals a full rebuild") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sbm25").toString
    val batch1 = Seq(
      (1L, "spark shuffles data between stages"),
      (2L, "the postings table is bucketed by token"))
    val batch2 = Seq(
      (3L, "bucketed layouts avoid exchanges in joins"),
      (4L, "token statistics drive bm25 scores"))
    val batch3 = Seq((5L, "spark serves bm25 from the bucketed table"))
    val queries = Seq((100L, Seq("spark", "bucketed", "token")))
      .toDF("query_id", "terms")

    // batch-build on batch1, then stream batches 2 and 3 through the
    // maintenance sink
    Bucketing.dropTable(spark, "sbm25_idx")
    Bucketing.dropTable(spark, "sbm25_idx_stats")
    TextAnalysis.buildBm25Index(batch1.toDF("doc_id", "text"),
      col("doc_id"), col("text"), "sbm25_idx", s"$dir/idx", numBuckets = 4)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingBm25.maintain(ms.toDS().toDF("doc_id", "text"),
      "doc_id", "text", "sbm25_idx", s"$dir/idx", s"$dir/ckpt",
      numBuckets = 4)
    try {
      ms.addData(batch2); q.processAllAvailable()
      ms.addData(batch3); q.processAllAvailable()
    } finally q.stop()

    val served = TextAnalysis.bm25JoinIndexed(spark, "sbm25_idx",
        queries, k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))

    // reference: one-shot index over the full corpus
    Bucketing.dropTable(spark, "sbm25_full")
    Bucketing.dropTable(spark, "sbm25_full_stats")
    TextAnalysis.buildBm25Index(
      (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"),
      col("doc_id"), col("text"), "sbm25_full", s"$dir/full", numBuckets = 4)
    val rebuilt = TextAnalysis.bm25JoinIndexed(spark, "sbm25_full",
        queries, k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))

    assert(served.toSeq == rebuilt.toSeq,
      s"served-after-appends must equal full rebuild:\n${served.toSeq}\nvs\n${rebuilt.toSeq}")
    assert(served.nonEmpty && served.exists(_._1 == 5L),
      "a document from the last streamed batch must be retrievable")

    // the serving join must stay exchange-free on the postings side
    // after appends (bucket spec preserved — same gate as the batch
    // index test: no token re-shuffle; per-query grouping remains)
    val plan = TextAnalysis.bm25JoinIndexed(spark, "sbm25_idx", queries, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(token"),
      s"appends must not break the bucketed layout:\n$plan")
  }

  test("a replayed batch id appends nothing (at-least-once made idempotent)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sbm25r").toString
    Bucketing.dropTable(spark, "sbm25r_idx")
    Bucketing.dropTable(spark, "sbm25r_idx_stats")
    TextAnalysis.buildBm25Index(Seq((1L, "seed doc")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), "sbm25r_idx", s"$dir/idx", numBuckets = 2)
    def runOnce(ckpt: String): Long = {
      val ms = MemoryStream[(Long, String)]
      val q = StreamingBm25.maintain(ms.toDS().toDF("doc_id", "text"),
        "doc_id", "text", "sbm25r_idx", s"$dir/idx", ckpt, numBuckets = 2)
      try { ms.addData(Seq((2L, "streamed doc"))); q.processAllAvailable() }
      finally q.stop()
      spark.catalog.refreshTable("sbm25r_idx")
      spark.table("sbm25r_idx").count()
    }
    val afterFirst = runOnce(s"$dir/ckpt1")
    // a fresh checkpoint restarts batch ids at 0 — exactly what a
    // crash-replay of the same batch id looks like to the sink
    val afterReplay = runOnce(s"$dir/ckpt2")
    assert(afterFirst > 2L, "first run must append")
    assert(afterReplay == afterFirst,
      s"replayed batch id must be a no-op: $afterFirst -> $afterReplay")
  }

  test("crash between append commit and marker does not double postings on replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sbm25c").toString
    Bucketing.dropTable(spark, "sbm25c_idx")
    Bucketing.dropTable(spark, "sbm25c_idx_stats")
    TextAnalysis.buildBm25Index(Seq((1L, "seed doc")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), "sbm25c_idx", s"$dir/idx", numBuckets = 2)
    def runOnce(ckpt: String): Unit = {
      val ms = MemoryStream[(Long, String)]
      val q = StreamingBm25.maintain(ms.toDS().toDF("doc_id", "text"),
        "doc_id", "text", "sbm25c_idx", s"$dir/idx", ckpt, numBuckets = 2)
      try { ms.addData(Seq((2L, "streamed doc words"))); q.processAllAvailable() }
      finally q.stop()
    }
    runOnce(s"$dir/ckpt1")
    spark.catalog.refreshTable("sbm25c_idx")
    val committed = spark.table("sbm25c_idx").count()
    // simulate the worst-case crash window: the batch's files reached
    // the table dir (append "committed") but the marker never landed —
    // delete the marker, keep the manifest, exactly the on-disk state
    // a crash between the moves and fs.create(marker) leaves
    val fs = new org.apache.hadoop.fs.Path(s"$dir/idx").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/idx/__batches/batch-0")
    val manifest = new org.apache.hadoop.fs.Path(s"$dir/idx/__batches/manifest-0")
    assert(fs.exists(marker) && fs.exists(manifest),
      "protocol must leave marker + manifest after a clean batch")
    fs.delete(marker, false)
    // replay the same batch id: the sink must reconcile (delete the
    // manifest-listed files) before re-appending — net effect, the
    // batch's postings appear exactly once
    runOnce(s"$dir/ckpt2")
    spark.catalog.refreshTable("sbm25c_idx")
    val afterReplay = spark.table("sbm25c_idx").count()
    assert(afterReplay == committed,
      s"crash-window replay must not double postings: $committed -> $afterReplay")
    // and the content equals a full rebuild (not just the row count)
    Bucketing.dropTable(spark, "sbm25c_full")
    Bucketing.dropTable(spark, "sbm25c_full_stats")
    TextAnalysis.buildBm25Index(
      Seq((1L, "seed doc"), (2L, "streamed doc words")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), "sbm25c_full", s"$dir/full", numBuckets = 2)
    val got = spark.table("sbm25c_idx").orderBy("id", "token").collect().toSeq
    val want = spark.table("sbm25c_full").orderBy("id", "token").collect().toSeq
    assert(got == want, s"replayed index must equal rebuild:\n$got\nvs\n$want")
  }
}
