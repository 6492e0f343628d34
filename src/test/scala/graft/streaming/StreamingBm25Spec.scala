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

  test("compact bounds per-bucket files, preserves results and bucket layout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sbm25k").toString
    val nBuckets = 4
    Bucketing.dropTable(spark, "sbm25k_idx")
    Bucketing.dropTable(spark, "sbm25k_idx_stats")
    TextAnalysis.buildBm25Index(
      Seq((1L, "spark shuffles data between stages")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), "sbm25k_idx", s"$dir/idx", nBuckets)
    val ms = MemoryStream[(Long, String)]
    val q = StreamingBm25.maintain(ms.toDS().toDF("doc_id", "text"),
      "doc_id", "text", "sbm25k_idx", s"$dir/idx", s"$dir/ckpt", nBuckets)
    try {
      (2 to 6).foreach { i =>
        ms.addData(Seq((i.toLong, s"bucketed token stream batch number $i " +
          "spark serves bm25 scores")))
        q.processAllAvailable()
      }
    } finally q.stop()
    val queries = Seq((100L, Seq("spark", "bucketed", "token")))
      .toDF("query_id", "terms")
    def served() = TextAnalysis.bm25JoinIndexed(spark, "sbm25k_idx", queries, 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val before = served()
    val root = new org.apache.hadoop.fs.Path(s"$dir/idx")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files() = fs.listStatus(root).toSeq.filter(_.isFile)
      .map(_.getPath.getName).filter(_.startsWith("part-"))
    val litter = files()
    assert(litter.size > nBuckets,
      s"appends must have produced per-bucket litter: ${litter.size}")
    val after = StreamingBm25.compact(spark, "sbm25k_idx", s"$dir/idx",
      numBuckets = nBuckets)
    assert(after <= nBuckets && files().size == after,
      s"compaction must bound files at one per bucket: $after, ${files()}")
    assert(served() == before,
      "served results must be identical after compaction")
    // bucket identity preserved: the serving join still runs with no
    // postings-side exchange
    val plan = TextAnalysis.bm25JoinIndexed(spark, "sbm25k_idx", queries, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(token"),
      s"compaction must not break the bucketed layout:\n$plan")
    // idempotent / already-compact: a second compact is a cheap no-op
    assert(StreamingBm25.compact(spark, "sbm25k_idx", s"$dir/idx",
      numBuckets = nBuckets) == after)
  }

  test("size-tiered compact merges only sub-floor files; the compacted base tier is untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sbm25t").toString
    val path = s"$dir/idx"
    val tbl = "sbm25t_idx"
    val n = 2
    Bucketing.dropTable(spark, tbl)
    spark.range(20000)
      .select(concat(lit("tok"), col("id") % 64).as("token"), col("id").as("x"))
      .write.format("parquet").option("path", path)
      .bucketBy(n, "token").sortBy("token").saveAsTable(tbl)
    // fold the base down to one BIG file per bucket (the earlier-
    // compaction tier the size floor must protect)
    StreamingBm25.compact(spark, tbl, path, numBuckets = n)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts() = fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
    val base = parts()
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime)).toSet
    val floor = base.map(_._2).min
    // per-batch append residue: five tiny files per bucket
    (1 to 5).foreach { i =>
      spark.range(4)
        .select(concat(lit("tok"), (col("id") + i) % 64).as("token"),
          col("id").as("x"))
        .write.mode("append").format("parquet").option("path", path)
        .bucketBy(n, "token").sortBy("token").saveAsTable(tbl)
    }
    spark.catalog.refreshTable(tbl)
    val want = spark.table(tbl).orderBy("token", "x").collect().toSeq
    val smalls = parts().filter(_.getLen < floor)
    assert(smalls.size > n, s"appends must litter sub-floor files: ${smalls.size}")
    val after = StreamingBm25.compact(spark, tbl, path, numBuckets = n,
      minFileBytes = floor)
    // the LSM claim: cost ∝ new data — the base tier is not rewritten,
    // not moved, not even touched (same names, lengths, mtimes)
    val now = parts()
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime)).toSet
    assert(base.subsetOf(now),
      s"tiered compact must leave the base tier untouched:\n$base\nvs\n$now")
    assert(parts().size == after && after <= 2 * n,
      s"small litter must merge to <=1 extra file per bucket: $after, ${parts().map(_.getPath.getName)}")
    spark.catalog.refreshTable(tbl)
    assert(spark.table(tbl).orderBy("token", "x").collect().toSeq == want,
      "tiered compaction changed the table's contents")
    // idempotent: the merged tier is <=1 sub-floor file per bucket now
    assert(StreamingBm25.compact(spark, tbl, path, numBuckets = n,
      minFileBytes = floor) == after)
    // and the bucketed layout survived the partial rewrite
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val probe = Seq("tok3").toDF("token")
      val j = probe.join(spark.table(tbl), "token")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("Bucketed: true") &&
        "Exchange".r.findAllIn(plan).size == 1,
        s"tiered compact broke the exchange-free read:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("a compact crash after the manifest rolls forward on recovery") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sbm25rf").toString
    val root = new org.apache.hadoop.fs.Path(s"$dir/idx")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Bucketing.dropTable(spark, "sbm25rf_idx")
    Bucketing.dropTable(spark, "sbm25rf_idx_stats")
    TextAnalysis.buildBm25Index(
      Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), "sbm25rf_idx", s"$dir/idx", numBuckets = 2)
    val orig = fs.listStatus(root).toSeq.filter(_.isFile)
      .map(_.getPath.getName).filter(_.startsWith("part-"))
    assert(orig.nonEmpty)
    // fabricate the worst crash window: compacted files fully staged,
    // manifest landed, NO moves done yet — recovery must finish the
    // swap (move adds in, delete olds) purely from the manifest
    val stage = new org.apache.hadoop.fs.Path(root, "__compact/stage")
    fs.mkdirs(stage)
    val newName = "part-00000-recovered-test_00000.parquet"
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(root,
      orig.head), fs, new org.apache.hadoop.fs.Path(stage, newName),
      false, spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(root, "__compact/manifest"), true)
    out.write((Seq(s"A $newName") ++ orig.map("D " + _))
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    StreamingBm25.recoverCompact(fs, root)
    val after = fs.listStatus(root).toSeq.filter(_.isFile)
      .map(_.getPath.getName).filter(_.startsWith("part-"))
    assert(after == Seq(newName),
      s"roll-forward must install adds and drop olds: $after")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "__compact")),
      "recovery must clear the protocol dir")
    // recovery is idempotent
    StreamingBm25.recoverCompact(fs, root)
  }
}
