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
