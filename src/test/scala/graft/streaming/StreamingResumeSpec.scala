package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Checkpoint kill-and-resume for STATEFUL streaming routes — the
  * operational path of a pipeline that ingests for weeks: a query
  * stopped after k micro-batches and restarted from the SAME
  * checkpointLocation must produce the answer of the uninterrupted
  * run, and a replayed foreachBatch delivery (at-least-once) must
  * converge under an idempotent sink. Until r12 these were scaladoc
  * claims with no test (the only restart-adjacent case was "a fresh
  * checkpoint restarts batch ids at 0").
  */
class StreamingResumeSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String = graft.TempDirs.create(tag).toString

  test("complete-mode aggregation resumes from its checkpoint: stop after 2 of 3 batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = Seq(
      Seq(("a", 10L), ("a", 20L), ("b", 5L)),
      Seq(("a", 30L), ("b", 7L), ("c", 100L)),
      Seq(("b", 9L), ("c", 200L), ("a", 40L)))
    def agg(df: DataFrame) = df.groupBy("k")
      .agg(count(lit(1)).as("n"), max(col("v")).as("mx"), sum(col("v")).as("s"))
    def collectTable(name: String) = spark.table(name).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    // uninterrupted reference run
    val msRef = MemoryStream[(String, Long)]
    val qRef = agg(msRef.toDS().toDF("k", "v")).writeStream.format("memory")
      .queryName("resume_ref").outputMode("complete")
      .option("checkpointLocation", tmp("res-ref")).start()
    try {
      batches.foreach { b => msRef.addData(b); qRef.processAllAvailable() }
    } finally qRef.stop()
    val want = collectTable("resume_ref")

    // interrupted run: 2 batches, stop, NEW query on the SAME checkpoint
    val ckpt = tmp("res-agg")
    val ms = MemoryStream[(String, Long)]
    val out = agg(ms.toDS().toDF("k", "v"))
    val q1 = out.writeStream.format("memory").queryName("resume_p1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      batches.take(2).foreach { b => ms.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    val q2 = out.writeStream.format("memory").queryName("resume_p2")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      ms.addData(batches(2)); q2.processAllAvailable()
    } finally q2.stop()
    assert(collectTable("resume_p2") == want,
      "resumed complete-mode state must equal the uninterrupted run")
  }

  test("latest-wins upsert resumes from its checkpoint across a stop") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = (1L to 20L).map(i => (i, 1L, s"p$i"))
    val upd = (1L to 20L).filter(_ % 3 == 0).map(i => (i, 2L, s"P2-$i"))
    val ckpt = tmp("res-upsert")
    val ms = MemoryStream[(Long, Long, String)]
    val out = StreamingUpsert.latestByKey(
      ms.toDS().toDF("doc_id", "version", "payload"),
      "doc_id", "version", Seq("payload"))
    val q1 = out.writeStream.format("memory").queryName("resume_up1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try { ms.addData(base); q1.processAllAvailable() } finally q1.stop()
    val q2 = out.writeStream.format("memory").queryName("resume_up2")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try { ms.addData(upd); q2.processAllAvailable() } finally q2.stop()
    val got = spark.table("resume_up2").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val want = (1L to 20L).map(i =>
      if (i % 3 == 0) (i, 2L, s"P2-$i") else (i, 1L, s"p$i"))
    assert(got == want, s"resumed upsert state diverged: $got")
  }

  test("file-sink maintained layout resumes exactly-once: no duplicate, no missing rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val centroids = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val half1 = (1L to 30L).map(i => (i, Seq(i.toFloat % 3, i.toFloat % 5)))
    val half2 = (31L to 60L).map(i => (i, Seq(10f + i % 3, 10f + i % 5)))
    val dir = tmp("res-ivf")
    val ms = MemoryStream[(Long, Seq[Float])]
    def start() = StreamingIvf.assignAndWrite(
      ms.toDS().toDF("vec_id", "embedding").select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding")),
      centroids, s"$dir/layout", s"$dir/ckpt")
    val q1 = start()
    try { ms.addData(half1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { ms.addData(half2); q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(s"$dir/layout")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (1L to 60L),
      s"resumed file sink must hold each row exactly once: ${got.size} rows")
  }

  test("foreachBatch replay (deleted commit marker) re-delivers deterministic rows; an idempotent sink converges") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = Seq((100L, "eval q1 q2 q3 answer")).toDF("doc_id", "text")
    val docBatches = Seq(
      Seq((1L, "intro text q1 q2 q3 more text"), (2L, "clean doc one")),
      Seq((3L, "q1 q2 q3"), (4L, "another clean doc here")))
    val filter = StreamingDecontam.benchmarkFilter(bench, col("text"), n = 3)
    // idempotent sink: upsert on doc_id, plus a delivery counter so the
    // test can PROVE the replay actually happened
    val sink = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long)]()
    val deliveries = new java.util.concurrent.atomic.AtomicInteger(0)
    def write(df: DataFrame): Unit = {
      deliveries.incrementAndGet()
      df.collect().foreach(r => sink.put(r.getLong(0), (r.getString(1), r.getLong(2))))
    }
    val ckpt = tmp("res-replay")
    val ms = MemoryStream[(Long, String)]
    def start() = StreamingDecontam.clipStream(
      ms.toDS().toDF("doc_id", "text"), col("doc_id"), col("text"),
      bench, col("text"), filter, minTokens = 3,
      checkpointDir = Some(ckpt))(write)
    val q1 = start()
    try {
      docBatches.foreach { b => ms.addData(b); q1.processAllAvailable() }
    } finally q1.stop()
    import scala.jdk.CollectionConverters._
    val snapshot = sink.asScala.toMap
    val n1 = deliveries.get()
    // force an at-least-once replay of the LAST batch: remove its
    // commit marker, leaving its offsets entry — on restart Spark sees
    // an uncommitted batch and re-executes it
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val names = java.nio.file.Files.list(commits).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit)).toSeq.sortBy(_.toInt)
    java.nio.file.Files.delete(commits.resolve(names.last))
    // the checksum sidecar too, or the re-commit's rename collides
    java.nio.file.Files.deleteIfExists(commits.resolve(s".${names.last}.crc"))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(deliveries.get() == n1 + 1,
      s"the uncommitted batch must re-deliver on restart (got ${deliveries.get()} vs $n1)")
    val replayed = sink.asScala.toMap
    assert(replayed == snapshot,
      "replayed delivery must be row-identical — idempotent sink unchanged")
    // and the content is the exact batch clipAgainst answer
    assert(replayed(3L)._1 == "" && replayed(3L)._2 == 3L,
      s"fully-contaminated doc must clip to empty: ${replayed(3L)}")
    assert(replayed(2L) == (("clean doc one", 0L)), s"${replayed(2L)}")
  }
}
