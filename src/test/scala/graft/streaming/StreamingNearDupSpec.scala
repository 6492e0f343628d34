package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.Dedup

/** Streaming self near-dup: prefix-causal keep-earliest verdicts equal
  * the batch MinHash operator's pairs regardless of batch boundaries;
  * within-batch and cross-batch dups both resolve to the smallest
  * earlier id; kill-and-resume over a compacted registry + rebuilt
  * bucket screen stays exact.
  */
class StreamingNearDupSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String = graft.TempDirs.create(tag).toString

  /** All messages down the cause chain — streaming wraps foreachBatch
    * failures in StreamingQueryException layers.
    */
  private def chainMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  /** Verdict rows (id, dup_of Option, jaccard Option), sorted by id. */
  private def runStream(rows: Seq[(Long, String)], nChunks: Int,
                        registryDir: String, minJaccard: Double,
                        ckpt: Option[String] = None,
                        buckets: Int = 4,
                        registerDups: Boolean = true):
      Seq[(Long, Option[Long], Option[Double])] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[Long], Option[Double])]()
    val q = StreamingNearDup.nearDupStream(
      ms.toDS().toDF("id", "text"), col("id"), col("text"),
      registryDir, ckpt, buckets = buckets, minJaccard = minJaccard,
      registerDups = registerDups) { df =>
      df.collect().foreach(r => got.add((r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
    }
    try {
      rows.grouped(math.max(1, (rows.length + nChunks - 1) / nChunks))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq.sortBy(_._1)
  }

  /** The batch operator's keep-earliest reduction: per id, the
    * smallest colliding-and-verified earlier id with ITS jaccard.
    */
  private def batchExpected(rows: Seq[(Long, String)], minJaccard: Double):
      Map[Long, (Long, Double)] = {
    import spark.implicits._
    Dedup.minhashPairs(rows.toDF("id", "text"), col("id"), col("text"),
        minJaccard = minJaccard)
      .groupBy("id_b").agg(min(struct(col("id_a"), col("jaccard"))).as("m"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1)))
      .toMap
  }

  private def corpus: Seq[(Long, String)] = {
    def uniq(i: Long) =
      (0 until 12).map(k => s"u${i}w${(i * 31 + k * 7) % 9973}").mkString(" ")
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi"
    Seq[(Long, String)](
      1L -> s"$shared rho sigma",        // near-dup class: long overlap
      2L -> uniq(2),
      3L -> s"$shared rho tau",          // near of 1 (one trailing token)
      4L -> uniq(4),
      5L -> s"$shared rho sigma",        // exact dup of 1
      6L -> uniq(6),
      7L -> s"$shared rho sigma",        // exact dup of 1 (keep-earliest -> 1)
      8L -> uniq(8),
      9L -> s"$shared rho tau",          // exact dup of 3
      10L -> uniq(10))
  }

  test("stream verdicts equal the batch operator's keep-earliest pairs, any batching") {
    val expected = batchExpected(corpus, minJaccard = 0.5)
    assert(expected.nonEmpty && expected.values.exists(_._2 < 1.0),
      s"fixture must plant exact AND near pairs: $expected")
    for (chunks <- Seq(1, 3)) {
      val got = runStream(corpus, chunks, tmp(s"nd-eq-$chunks") + "/reg",
        minJaccard = 0.5)
      assert(got.map(_._1) == corpus.map(_._1).sorted)
      got.foreach { case (id, dupOf, j) =>
        expected.get(id) match {
          case Some((eDup, eJ)) =>
            assert(dupOf.contains(eDup) && j.contains(eJ),
              s"id=$id: got ($dupOf, $j), want ($eDup, $eJ) [chunks=$chunks]")
          case None =>
            assert(dupOf.isEmpty && j.isEmpty,
              s"id=$id admitted by batch op but flagged ($dupOf) [chunks=$chunks]")
        }
      }
    }
  }

  test("below-threshold near pairs are admitted at a high threshold") {
    val got = runStream(corpus, 3, tmp("nd-thresh") + "/reg", minJaccard = 0.95)
    val flagged = got.filter(_._2.isDefined)
    // only the exact copies (J = 1.0) survive 0.95; every jaccard is 1.0
    assert(flagged.map(_._1).toSet == Set(5L, 7L, 9L), flagged.toString)
    assert(flagged.forall(_._3.contains(1.0)), flagged.toString)
    assert(flagged.collect { case (5L, d, _) => d }.head.contains(1L))
    assert(flagged.collect { case (9L, d, _) => d }.head.contains(3L))
  }

  test("keep-first registration: registry grows with admitted docs, orbits resolve via the keeper") {
    val reg = tmp("nd-keepfirst") + "/reg"
    val got = runStream(corpus, 3, reg, minJaccard = 0.9,
      registerDups = false)
    // identical orbit {1, 5, 7}: 5 and 7 both resolve to keeper 1 even
    // though dup 5 was never registered (cross-batch via the keeper,
    // or within-batch where registration scope does not apply)
    assert(got.filter(_._2.isDefined).map(r => (r._1, r._2.get)) ==
      Seq((5L, 1L), (7L, 1L), (9L, 3L)), got.toString)
    // the registries hold ONLY the 7 admitted documents
    spark.catalog.refreshTable(StreamingNearDup.docsTableName(reg))
    spark.catalog.refreshTable(StreamingNearDup.bandsTableName(reg))
    assert(spark.table(StreamingNearDup.docsTableName(reg)).count() == 7L)
    assert(spark.table(StreamingNearDup.bandsTableName(reg))
      .select("id").distinct().count() == 7L)
  }

  test("bands probe reads the registry through its bucketed scan, no registry exchange") {
    val regDir = tmp("nd-bucketed") + "/reg"
    runStream(corpus, 3, regDir, minJaccard = 0.5)
    val tbl = StreamingNearDup.bandsTableName(regDir)
    spark.catalog.refreshTable(tbl)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val batchKeys = Seq(123L, 456L).toDF("band_key")
      val j = batchKeys.join(
        spark.table(tbl).select(col("band_key"), col("id")), "band_key")
      j.collect()
      // AQE's toString prints the Final AND Initial plans — assert on
      // the final section only or every node double-counts
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("Bucketed: true"),
        s"bands registry must read through its bucketed scan:\n$plan")
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"only the batch side may shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("kill-and-resume over compacted registries + rebuilt bucket screen stays exact") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmp("nd-resume")
    val reg = base + "/reg"
    val ckpt = base + "/ckpt"
    MaintainedScreen.events.clear()
    val ms = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[Long], Option[Double])]()
    def start() = StreamingNearDup.nearDupStream(
      ms.toDS().toDF("id", "text"), col("id"), col("text"),
      reg, Some(ckpt), buckets = 4, minJaccard = 0.9) { df =>
      df.collect().foreach(r => got.add((r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
    }
    val q1 = start()
    try {
      ms.addData(corpus.take(4)); q1.processAllAvailable()
      ms.addData(corpus.slice(4, 7)); q1.processAllAvailable()
    } finally q1.stop()
    // maintenance window + fresh-process simulation (the catalog DROP
    // is the honest analog — the external catalog is per-context)
    StreamingNearDup.compact(spark, reg, 4, rebuildScreen = true)
    spark.sql(s"DROP TABLE IF EXISTS ${StreamingNearDup.bandsTableName(reg)}")
    spark.sql(s"DROP TABLE IF EXISTS ${StreamingNearDup.docsTableName(reg)}")
    val q2 = start()
    try {
      ms.addData(corpus.drop(7)); q2.processAllAvailable()
    } finally q2.stop()
    import scala.jdk.CollectionConverters._
    val out = got.asScala.toSeq.sortBy(_._1)
    // doc 9 (exact copy of doc 3, which q1 registered) must be caught
    // by q2's FIRST batch: its band keys sit in the BUCKET blooms (the
    // tail bloom is empty right after the rebuild), so this pins the
    // executor-probed screen leg end to end
    assert(out.collect { case (9L, d, j) => (d, j) } ==
      Seq((Some(3L), Some(1.0))), out.toString)
    assert(out.collect { case (7L, d, _) => d } == Seq(Some(1L)), out.toString)
    assert(out.count(_._2.isEmpty) == 7, out.toString)
    val events = MaintainedScreen.events.asScala.toSeq
    assert(events.exists(e => e.startsWith("near-dup") &&
      e.contains("bucket screen covered=")), events.toString)
  }

  test("rebucket 4->8 between stream runs keeps verdicts exact; stale counts refuse") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmp("nd-rebucket")
    val reg = base + "/reg"
    val ckpt = base + "/ckpt"
    val expected = batchExpected(corpus, minJaccard = 0.9)
    val ms = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[Long], Option[Double])]()
    def start(buckets: Int) = StreamingNearDup.nearDupStream(
      ms.toDS().toDF("id", "text"), col("id"), col("text"),
      reg, Some(ckpt), buckets = buckets, minJaccard = 0.9) { df =>
      df.collect().foreach(r => got.add((r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
    }
    // phase 1 at 4 buckets
    val q1 = start(4)
    try {
      ms.addData(corpus.take(4)); q1.processAllAvailable()
      ms.addData(corpus.slice(4, 7)); q1.processAllAvailable()
    } finally q1.stop()
    // maintenance window: fresh-process simulation (the catalog is
    // per-context), then the 4->8 rebucket + screen rebuild
    spark.sql(s"DROP TABLE IF EXISTS ${StreamingNearDup.bandsTableName(reg)}")
    spark.sql(s"DROP TABLE IF EXISTS ${StreamingNearDup.docsTableName(reg)}")
    StreamingNearDup.rebucket(spark, reg, 8, rebuildScreen = true)
    // the non-migrated case stays protected: a resume at the OLD count
    // must refuse (marker now says 8)
    val qStale = start(4)
    val e = intercept[Exception] {
      try { ms.addData(Seq(99L -> "stale count probe")); qStale.processAllAvailable() }
      finally qStale.stop()
    }
    assert(chainMsg(e).contains("refusing"), chainMsg(e))
    // phase 2 at 8 buckets resumes the checkpoint: cross-phase dups
    // (9 is an exact copy of 3, registered in phase 1 pre-rebucket)
    // must be caught through the re-bucketed registry + rebuilt screen
    val q2 = start(8)
    try {
      ms.addData(corpus.drop(7)); q2.processAllAvailable()
    } finally q2.stop()
    import scala.jdk.CollectionConverters._
    val all = got.asScala.toSeq.sortBy(_._1)
    all.filterNot(_._1 == 99L).foreach { case (id, dupOf, j) =>
      expected.get(id) match {
        case Some((eDup, eJ)) =>
          assert(dupOf.contains(eDup) && j.contains(eJ),
            s"id=$id: got ($dupOf, $j), want ($eDup, $eJ) after rebucket")
        case None => assert(dupOf.isEmpty, s"id=$id wrongly flagged: $dupOf")
      }
    }
    // the rebucketed part-files really carry 8 bucket ids
    val fs = new org.apache.hadoop.fs.Path(reg)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val re = "_(\\d{5})\\.".r
    val ids = fs.listStatus(new org.apache.hadoop.fs.Path(reg + "/bands"))
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .flatMap(st => re.findFirstMatchIn(st.getPath.getName)
        .map(_.group(1).toInt)).toSet
    assert(ids.max >= 4 && ids.max < 8, s"bucket ids after rebucket: $ids")
  }

  test("rebucket refuses while the stream is active in this JVM") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reg = tmp("nd-rebucket-live") + "/reg"
    val ms = MemoryStream[(Long, String)]
    val q = StreamingNearDup.nearDupStream(
      ms.toDS().toDF("id", "text"), col("id"), col("text"),
      reg, buckets = 4) { df => df.collect(); () }
    try {
      ms.addData(corpus.take(3)); q.processAllAvailable()
      val e = intercept[IllegalArgumentException] {
        StreamingNearDup.rebucket(spark, reg, 8)
      }
      assert(e.getMessage.contains("still active"), e.getMessage)
    } finally q.stop()
    // stopped stream releases the guard
    StreamingNearDup.rebucket(spark, reg, 8)
  }

  test("geometry marker: resume under a different banding fails loudly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmp("nd-geom")
    val reg = base + "/reg"
    val ckpt = base + "/ckpt"
    val ms = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Option[Long], Option[Double])]()
    def start(shingleN: Int) = StreamingNearDup.nearDupStream(
      ms.toDS().toDF("id", "text"), col("id"), col("text"),
      reg, Some(ckpt), buckets = 4, shingleN = shingleN,
      minJaccard = 0.9) { df =>
      df.collect().foreach(r => got.add((r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
    }
    val q1 = start(3)
    try { ms.addData(corpus.take(5)); q1.processAllAvailable() }
    finally q1.stop()
    // different shingle n => band keys that never collide with the
    // registered ones; without the marker this resume would silently
    // admit every duplicate of phase-1 content
    val qBad = start(5)
    val e = intercept[Exception] {
      try { ms.addData(corpus.drop(5)); qBad.processAllAvailable() }
      finally qBad.stop()
    }
    assert(chainMsg(e).contains("geometry"), chainMsg(e))
    // the SAME geometry resumes fine and sees phase-1 registrations:
    // 7 is an exact copy of 1, registered before the failed resume
    val q2 = start(3)
    try { q2.processAllAvailable() } finally q2.stop()
    import scala.jdk.CollectionConverters._
    val out = got.asScala.toSeq.sortBy(_._1)
    assert(out.collect { case (7L, d, _) => d } == Seq(Some(1L)),
      out.toString)
  }
}
