package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.MaintenancePolicy.{TableStats, plan}

/** Derived maintenance policy: every trigger is a function of on-disk
  * stats, pinned here at its derived boundary — tier floor from
  * observed append bytes (clamped), full screen build exactly when the
  * delta tier crosses 25% of the base, rebucket recommended exactly
  * when rows/bucket crosses the single-task bloom budget. The
  * integration leg drives a real registry through
  * build → extend → full-rebuild with ZERO caller-chosen dials.
  */
class MaintenancePolicySpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String = graft.TempDirs.create(tag).toString

  private def stats(buckets: Int = 8, rows: Long = 1000,
                    files: Int = 8, bytes: Long = 1L << 20,
                    batches: Long = 4,
                    screen: Option[BucketScreen.Meta] = None,
                    deltaRows: Long = 0): TableStats =
    TableStats(buckets, rows, files, bytes, batches, screen, deltaRows)

  private def meta(covered: Long, baseCovered: Long) =
    Some(BucketScreen.Meta(8, covered, 1e-6, 4096, baseCovered))

  test("tier floor derives from per-(batch,bucket) append bytes, clamped") {
    // 32 MiB over 4 batches x 8 buckets = 1 MiB per append; floor = 4x
    assert(plan(stats(bytes = 32L << 20)).tierFloorBytes == 4L << 20)
    // tiny registries clamp at the 64 KiB floor
    assert(plan(stats(bytes = 1024)).tierFloorBytes == 64L << 10)
    // huge appends clamp at 64 MiB
    assert(plan(stats(bytes = 1L << 40)).tierFloorBytes == 64L << 20)
    // fanout is the derived constant, never a caller dial
    assert(plan(stats()).tierFanout == MaintenancePolicy.TierFanout)
  }

  test("screen: build when absent; extend below 25% delta; full build " +
      "at the derived boundary") {
    assert(plan(stats(screen = None)).fullScreenBuild)
    // base 1000 rows, delta 200 (20%) -> extend
    assert(!plan(stats(rows = 1200, screen = meta(5, 3),
      deltaRows = 200)).fullScreenBuild)
    // delta 251 over base 1000 (25.1%) -> full build: the boundary
    assert(plan(stats(rows = 1251, screen = meta(5, 3),
      deltaRows = 251)).fullScreenBuild)
    assert(!plan(stats(rows = 1250, screen = meta(5, 3),
      deltaRows = 250)).fullScreenBuild)
  }

  test("rebucket recommended exactly past the single-task bloom budget, " +
      "doubling until back under") {
    val max = MaintenancePolicy.MaxRowsPerBucket
    assert(plan(stats(buckets = 8, rows = 8L * max)).rebucketTo.isEmpty)
    assert(plan(stats(buckets = 8, rows = 8L * max + 8))
      .rebucketTo == Some(16))
    // 5x over budget needs three doublings (8 -> 64)
    assert(plan(stats(buckets = 8, rows = 40L * max))
      .rebucketTo == Some(64))
  }

  test("the bloom-budget override scales the boundary (per-task " +
      "envelope is the deployment's, the trigger is still derived)") {
    val budget = 4096L // bytes -> ~1139 rows/bucket
    val max = MaintenancePolicy.maxRowsPerBucket(budget)
    assert(max > 0 && max < MaintenancePolicy.MaxRowsPerBucket)
    assert(plan(stats(buckets = 4, rows = 4L * max),
      bloomBudgetBytes = budget).rebucketTo.isEmpty)
    assert(plan(stats(buckets = 4, rows = 4L * max + 4),
      bloomBudgetBytes = budget).rebucketTo == Some(8))
    // the default budget's constant is itself the derivation at 256 MiB
    assert(MaintenancePolicy.MaxRowsPerBucket ==
      MaintenancePolicy.maxRowsPerBucket(
        MaintenancePolicy.MaxBloomBytesPerBucket))
  }

  test("statsFor counts DISTINCT batch ids: pre-seeded (batch_id = -1) " +
      "and offset histories keep a meaningful per-append estimate") {
    val dir = tmp("policy-stats") + "/reg"
    val tbl = "graft_policy_stats_test"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // a probe-style pre-seeded registry: bulk load at batch_id = -1,
    // then one real append at batch_id = 5 — max+1 would say 6 batches
    // (overcount) and a pure bulk load would say 0 (collapse); the
    // distinct count says 2
    spark.range(1000)
      .selectExpr("id AS h", "CAST(-1 AS BIGINT) AS batch_id")
      .unionAll(spark.range(50)
        .selectExpr("id + 5000 AS h", "CAST(5 AS BIGINT) AS batch_id"))
      .repartition(4, pmod(hash(col("h")), lit(4)))
      .write.format("parquet").option("path", dir)
      .bucketBy(4, "h").sortBy("h").saveAsTable(tbl)
    val st = MaintenancePolicy.statsFor(spark, tbl, dir, buckets = 4)
    assert(st.rows == 1050 && st.batches == 2, st.toString)
    assert(st.dataBytes > 0 && st.dataFiles > 0)
    // per-append estimate: bytes / 2 batches / 4 buckets, NOT bytes/6
    val p = plan(st)
    assert(p.tierFloorBytes >= MaintenancePolicy.TierFloorMinBytes)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("integration: zero-dial maintain drives build -> extend -> " +
      "full rebuild on a real registry") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reg = tmp("policy-int") + "/reg"
    val ms = MemoryStream[(Long, String)]
    val q = StreamingNearDup.nearDupStream(
      ms.toDS().toDF("id", "text"), col("id"), col("text"),
      reg, buckets = 4, minJaccard = 0.9) { df => df.collect(); () }
    def feed(ids: Range): Unit = {
      ms.addData(ids.map(i =>
        (i.toLong, (0 until 8).map(j => s"u${i}w$j").mkString(" "))))
      q.processAllAvailable()
    }
    val fs = new Path(reg).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      feed(0 until 40) // batch 0: 40 unique docs -> 320 band rows
      // window 1: no screen meta -> the policy must FULL BUILD
      val p1 = StreamingNearDup.maintain(spark, reg).get
      assert(p1.fullScreenBuild)
      val m1 = BucketScreen.readMeta(fs, s"$reg/bands").get
      assert(m1.baseCovered == m1.coveredBatch, m1.toString)
      feed(100 until 104) // batch 1: 4 docs -> 32 band rows (10% delta)
      // window 2: delta 32/320 = 10% < 25% -> EXTEND (base untouched)
      val p2 = StreamingNearDup.maintain(spark, reg).get
      assert(!p2.fullScreenBuild)
      val m2 = BucketScreen.readMeta(fs, s"$reg/bands").get
      assert(m2.baseCovered == m1.baseCovered, s"extend must not move the base: $m2")
      assert(m2.coveredBatch > m2.baseCovered, s"delta tier must now exist: $m2")
      feed(200 until 240) // batch 2: 40 docs -> delta 352/320 > 25%
      // window 3: the derived boundary fires a FULL BUILD
      val p3 = StreamingNearDup.maintain(spark, reg).get
      assert(p3.fullScreenBuild)
      val m3 = BucketScreen.readMeta(fs, s"$reg/bands").get
      assert(m3.baseCovered == m3.coveredBatch && m3.baseCovered > m1.baseCovered,
        s"full build must fold the delta into a new base: $m3")
      assert(p3.rebucketTo.isEmpty) // tiny registry: no recommendation
      // every window left a machine-readable trail: one JSON line per
      // maintainTable call on the bands dir, in order, recording the
      // stats observed and the plan applied — the audit the stderr
      // lines alone could not provide
      val log = MaintenanceLog.read(fs, s"$reg/bands")
      assert(log.length == 3, s"3 windows -> 3 lines: $log")
      assert(log(0).contains("\"screen_op\":\"build\"") &&
        log(1).contains("\"screen_op\":\"extend\"") &&
        log(2).contains("\"screen_op\":\"build\""),
        log.mkString("\n"))
      log.foreach { l =>
        assert(l.contains("\"rows\":") && l.contains("\"batches\":") &&
          l.contains("\"tier_floor_bytes\":") && l.contains("\"secs\":") &&
          l.contains("\"rebucket_to\":0") && l.contains("\"holder\":"), l)
      }
      // the feature store's windows log to ITS dir
      assert(MaintenanceLog.read(fs, s"$reg/docs").length == 3)
    } finally q.stop()
  }

  test("integration: the gram route's zero-dial maintainRegistry " +
      "builds then extends its screen") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reg = tmp("policy-gram") + "/reg"
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingSelfDedup.clipStream(
      ms.toDS().toDF("id", "text"), col("id"), col("text"),
      minTokens = 4, registryDir = reg,
      registryBuckets = 4) { df => df.collect(); () }
    def feed(ids: Range): Unit = {
      ms.addData(ids.map(i =>
        (i.toLong, (0 until 8).map(j => s"g${i}w$j").mkString(" "))))
      q.processAllAvailable()
    }
    val fs = new Path(reg).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      feed(0 until 30)
      val p1 = StreamingSelfDedup.maintainRegistry(spark, reg).get
      assert(p1.fullScreenBuild) // no screen yet -> build
      val m1 = BucketScreen.readMeta(fs, reg).get
      feed(100 until 102) // small tail -> extend
      val p2 = StreamingSelfDedup.maintainRegistry(spark, reg).get
      assert(!p2.fullScreenBuild)
      val m2 = BucketScreen.readMeta(fs, reg).get
      assert(m2.baseCovered == m1.baseCovered && m2.coveredBatch > m1.coveredBatch,
        s"gram-route extend must keep the base and advance coverage: $m2")
    } finally q.stop()
  }
}
