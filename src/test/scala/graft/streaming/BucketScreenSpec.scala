package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Per-bucket registry screens: executor-probed blooms + driver tail —
  * the beyond-driver-memory screen tier. Covers the build/probe
  * contract (no false negatives, positives bounded by hits), the
  * missing-file loud failure, fresh-start pickup of an on-disk screen,
  * and the outgrowth → compaction-rebuild → revival lifecycle.
  */
class BucketScreenSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String = graft.TempDirs.create(tag).toString

  /** A bucketed registry table over `grams`, batch_id 0. */
  private def mkRegistry(grams: Seq[String], dir: String, buckets: Int): String = {
    import spark.implicits._
    val tbl = StreamingSelfDedup.registryTableName(dir)
    grams.toDF("gram")
      .select(xxhash64(col("gram")).as("h"), col("gram"), lit(0L).as("batch_id"))
      .write.format("parquet").option("path", dir)
      .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
    tbl
  }

  private def hashOf(s: String): Long = {
    import spark.implicits._
    Seq(s).toDF("g").select(xxhash64(col("g"))).collect()(0).getLong(0)
  }

  test("build + probe: positives are exactly the registry hits (superset contract, no false negatives)") {
    import spark.implicits._
    val dir = tmp("bs-probe") + "/reg"
    val regGrams = (0 until 500).map(i => s"reg gram number $i")
    val tbl = mkRegistry(regGrams, dir, buckets = 4)
    assert(BucketScreen.build(spark, tbl, dir, buckets = 4).contains(0L))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = BucketScreen.readMeta(fs, dir)
    assert(meta.exists(m => m.buckets == 4 && m.coveredBatch == 0L), meta.toString)
    // batch seeds: 10 registry hits interleaved with 200 fresh hashes
    val hits = regGrams.take(10).map(hashOf)
    val fresh = (0 until 200).map(i => hashOf(s"fresh gram $i"))
    val seeds = (hits ++ fresh ++ hits).toDF("h") // dupes must collapse
    val screen = BucketScreen.probe(dir, 4, probeDeltas = false,
      tailMightContain = _ => false)
    val pos = screen.positives(seeds)
    assert(pos.sorted.sameElements(pos), "positives must come back sorted")
    assert(hits.toSet.subsetOf(pos.toSet),
      "every true hit must screen positive (a miss under-clips)")
    // at 1e-6 fpp over 210 probes, any false positive is ~0 probability
    assert(pos.toSet == hits.toSet,
      s"positives must be the hits, got ${pos.length} for ${hits.size} hits")
    // the tail tier unions in (driver-side): mark one fresh hash as a
    // post-build append
    val tailHash = fresh.head
    val pos2 = BucketScreen.probe(dir, 4, probeDeltas = false,
      h => h == tailHash).positives(seeds)
    assert(pos2.toSet == hits.toSet + tailHash, "tail tier must union in")
  }

  /** Append `grams` to an existing registry table under `batchId`. */
  private def appendRegistry(grams: Seq[String], dir: String, buckets: Int,
                             batchId: Long): Unit = {
    import spark.implicits._
    val tbl = StreamingSelfDedup.registryTableName(dir)
    grams.toDF("gram")
      .select(xxhash64(col("gram")).as("h"), col("gram"),
        lit(batchId).as("batch_id"))
      .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
      .write.mode("append").format("parquet").option("path", dir)
      .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
  }

  test("extend folds only the tail into per-bucket DELTAS; covered advances, no false negatives") {
    import spark.implicits._
    val dir = tmp("bs-extend") + "/reg"
    val base = (0 until 400).map(i => s"base gram $i")
    val tbl = mkRegistry(base, dir, buckets = 4)
    assert(BucketScreen.build(spark, tbl, dir, buckets = 4).contains(0L))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cap0 = BucketScreen.readMeta(fs, dir).get.capacityPerBucket
    val baseMtimes = (0 until 4).map { b =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(
        dir, f"_screen/bloom-$b%05d.bin")).getModificationTime
    }
    val tail1 = (0 until 80).map(i => s"tail one gram $i")
    val tail2 = (0 until 80).map(i => s"tail two gram $i")
    appendRegistry(tail1, dir, 4, batchId = 1L)
    appendRegistry(tail2, dir, 4, batchId = 2L)
    assert(BucketScreen.extendOrBuild(spark, tbl, dir, buckets = 4)
      .contains(2L))
    val meta = BucketScreen.readMeta(fs, dir).get
    assert(meta.coveredBatch == 2L && meta.baseCovered == 0L &&
      meta.capacityPerBucket == cap0,
      s"extend must advance covered, keep base_covered and capacity: $meta")
    // the BASE blooms were never rewritten (extension I/O is the
    // delta's bytes, not the screen's) and every bucket has a delta
    (0 until 4).foreach { b =>
      val basePath = new org.apache.hadoop.fs.Path(
        dir, f"_screen/bloom-$b%05d.bin")
      assert(fs.getFileStatus(basePath).getModificationTime == baseMtimes(b),
        s"base bloom $b must not be rewritten by extend")
      assert(fs.exists(new org.apache.hadoop.fs.Path(
        dir, f"_screen/bloom-$b%05d.delta.bin")),
        s"bucket $b must carry a delta file")
    }
    // old hits (base blooms) AND tail hits (deltas) all screen positive
    // with an EMPTY driver tail, fresh hashes do not
    val hits = (base.take(5) ++ tail1.take(5) ++ tail2.take(5)).map(hashOf)
    val fresh = (0 until 200).map(i => hashOf(s"never registered $i"))
    val pos = BucketScreen.probe(dir, 4, probeDeltas = true, _ => false)
      .positives((hits ++ fresh).toDF("h"))
    assert(pos.toSet == hits.toSet,
      s"extended screen must hit old+tail and nothing else: ${pos.length}")
    // idempotent: nothing past covered => no-op at the same covered id
    assert(BucketScreen.extend(spark, tbl, dir, buckets = 4).contains(2L))
  }

  test("a tail that saturates the delta is rebuilt re-sized from the delta-tier rows") {
    import spark.implicits._
    val dir = tmp("bs-saturate") + "/reg"
    val tbl = mkRegistry((0 until 100).map(i => s"small base $i"), dir, 4)
    assert(BucketScreen.build(spark, tbl, dir, buckets = 4).contains(0L))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cap0 = BucketScreen.readMeta(fs, dir).get.capacityPerBucket
    // first extend: small tail => fresh deltas at the 4096 floor
    appendRegistry((0 until 80).map(i => s"small tail $i"), dir, 4, 1L)
    assert(BucketScreen.extend(spark, tbl, dir, buckets = 4).contains(1L))
    val deltaLen0 = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      dir, "_screen/bloom-00000.delta.bin")).getLen
    // second extend: ~10k rows/bucket >> the floor-capacity delta —
    // the incremental put saturates and the delta tier is REBUILT in
    // place from one batch_id > base_covered scan at a re-sized
    // capacity; the extend still SUCCEEDS and the base is untouched
    val big = (0 until 40000).map(i => s"saturating tail gram $i")
    appendRegistry(big, dir, 4, batchId = 2L)
    assert(BucketScreen.extend(spark, tbl, dir, buckets = 4).contains(2L),
      "a saturating delta must re-size in place, not abort")
    val meta = BucketScreen.readMeta(fs, dir).get
    assert(meta.capacityPerBucket == cap0 && meta.baseCovered == 0L &&
      meta.coveredBatch == 2L, s"base untouched, covered advanced: $meta")
    val deltaLen1 = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      dir, "_screen/bloom-00000.delta.bin")).getLen
    assert(deltaLen1 > deltaLen0,
      s"re-sized delta must be larger: $deltaLen0 -> $deltaLen1")
    // no stranded extend tmps
    val leftovers = fs.listStatus(
      new org.apache.hadoop.fs.Path(dir, "_screen"))
      .map(_.getPath.getName).filter(_.contains(".tmp-extend"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    // old delta rows AND the saturating tail all hit; absents do not
    val hit = hashOf("saturating tail gram 7")
    val hitOld = hashOf("small tail 3")
    val pos = BucketScreen.probe(dir, 4, probeDeltas = true, _ => false)
      .positives(Seq(hit, hitOld, hashOf("absent gram x")).toDF("h"))
    assert(pos.toSet == Set(hit, hitOld), pos.mkString(","))
    // a mismatched bucket count still refuses (the full-build fallback)
    assert(BucketScreen.extend(spark, tbl, dir, buckets = 8).isEmpty)
  }

  test("a swept-away bloom file fails loudly instead of returning false negatives") {
    import spark.implicits._
    val dir = tmp("bs-missing") + "/reg"
    val tbl = mkRegistry((0 until 50).map(i => s"g $i"), dir, buckets = 4)
    assert(BucketScreen.build(spark, tbl, dir, buckets = 4).isDefined)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // every bucket has a bloom file (even empty buckets get one)
    val screenDir = new org.apache.hadoop.fs.Path(dir, "_screen")
    val blooms = fs.listStatus(screenDir).map(_.getPath.getName)
      .filter(_.startsWith("bloom-")).sorted
    assert(blooms.sameElements((0 until 4).map(b => f"bloom-$b%05d.bin")),
      blooms.mkString(","))
    fs.delete(new org.apache.hadoop.fs.Path(screenDir, blooms.head), false)
    // a probe hash that lands in the DELETED bucket (bucket 0)
    val probeHash = (0 until 50).map(i => hashOf(s"g $i")).toDF("h")
      .select(col("h"), pmod(hash(col("h")), lit(4)).as("b"))
      .collect().filter(_.getInt(1) == 0).map(_.getLong(0)).head
    intercept[org.apache.spark.SparkException] {
      BucketScreen.probe(dir, 4, probeDeltas = false, _ => false)
        .positives(Seq(probeHash).toDF("h"))
    }
  }

  test("fresh stream start picks up an on-disk screen and the bucket leg clips pre-screen grams") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmp("bs-stream")
    val dir = base + "/reg"
    val ckpt = base + "/ckpt" // shared: batch ids must CONTINUE across
    // the two query starts (the registry's batch-id fence and the
    // screen's covered_batch both assume the checkpoint's monotonic
    // batch numbering — the same contract the resume gates pin)
    StreamingSelfDedup.screenEvents.clear()
    val ms = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    def run(rows: Seq[(Long, String)]): Seq[(Long, String, Long)] = {
      got.clear()
      val q = StreamingSelfDedup.clipStream(
        ms.toDS().toDF("doc_id", "text"), col("doc_id"), col("text"),
        3, dir, Some(ckpt), registryBuckets = 4) { df =>
        df.collect().foreach(r => got.add((r.getLong(0), r.getString(1), r.getLong(2))))
      }
      try rows.foreach { r => ms.addData(Seq(r)); q.processAllAvailable() }
      finally q.stop()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.sortBy(_._1)
    }
    val r1 = run(Seq((1L, "a b s1 s2 s3 s4 s5 c d")))
    assert(r1 == Seq((1L, "a b s1 s2 s3 s4 s5 c d", 0L)))
    // maintenance window: compact + build the bucket screens
    StreamingSelfDedup.compactRegistry(spark, dir, 4, rebuildScreen = true)
    // FRESH start (new query, registry + screen on disk): the next doc
    // repeats run-1 grams — the tail bloom is EMPTY for them, so the
    // clip proves the executor bucket leg screened them positive
    val r2 = run(Seq((2L, "x s1 s2 s3 s4 s5 y z w q")))
    assert(r2 == Seq((2L, "x y z w q", 5L)),
      s"bucket-leg positives must clip pre-screen grams: $r2")
    import scala.jdk.CollectionConverters._
    val events = StreamingSelfDedup.screenEvents.asScala.toSeq
    assert(events.exists(_.contains("whole-registry driver bloom")), events.toString)
    assert(events.exists(_.contains("bucket screen covered=")), events.toString)
  }

  test("outgrown tail screen revives after a compaction rebuild, output stays exact") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("bs-revive") + "/reg"
    StreamingSelfDedup.screenEvents.clear()
    val ms = MemoryStream[(Long, String)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    // tiny capacity: batch 0's ~200 grams outgrow it on extension
    val q = StreamingSelfDedup.clipStream(
      ms.toDS().toDF("doc_id", "text"), col("doc_id"), col("text"),
      3, dir, registryBuckets = 4, screenCapacity = 64L) { df =>
      df.collect().foreach(r => got.add((r.getLong(0), r.getString(1), r.getLong(2))))
    }
    import scala.jdk.CollectionConverters._
    def events() = StreamingSelfDedup.screenEvents.asScala.toSeq
    try {
      val big = (0 until 220).map(i => s"w$i").mkString(" ")
      ms.addData(Seq((1L, big))); q.processAllAvailable()
      assert(events().exists(_.contains("screen dropped")),
        s"tiny capacity must outgrow on batch 0's extension: ${events()}")
      // dead screen: this batch runs the exact path (correctness holds)
      ms.addData(Seq((2L, "q1 q2 w0 w1 w2 q3 q4"))); q.processAllAvailable()
      // maintenance: compact + rebuild folds everything into the
      // bucket blooms; the tail resets to empty
      StreamingSelfDedup.compactRegistry(spark, dir, 4, rebuildScreen = true)
      ms.addData(Seq((3L, "p1 p2 p3 p4 p5"))); q.processAllAvailable()
      assert(events().exists(_.contains("screen revived")),
        s"post-rebuild batch must revive the screen: ${events()}")
      // and the revived screen still clips exactly: w0 w1 w2 repeats
      // batch 0 grams (bucket leg), p1..p5 repeats batch 3 (tail leg)
      ms.addData(Seq((4L, "w0 w1 w2 z zz p1 p2 p3 p4 p5")))
      q.processAllAvailable()
    } finally q.stop()
    val out = got.asScala.toSeq.sortBy(_._1)
    assert(out(1) == (2L, "q1 q2 q3 q4", 3L), s"exact path while dead: $out")
    assert(out(3) == (4L, "z zz", 8L), s"revived screen must clip exactly: $out")
  }

  test("extend split: collect buffers without mutating the screen, apply lands the keys (and still drops on saturation)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val noDir = new org.apache.hadoop.fs.Path("/graft-spec-nonexistent")
    val msc = new MaintainedScreen("/graft-spec-nonexistent", 0,
      capacity = 1000, fpp = 1e-6, "spec")
    msc.refresh(fs, noDir, 0L,
      registryHashes = Seq(1L, 2L, 3L).toDF("h"),
      tailHashes = _ => fail("no bucket screen exists"))
    val newHashes = Seq(100L, 200L).toDF("h")
    val bufs = msc.extendCollect(newHashes)
    // the collect phase ran the job but must NOT have mutated the
    // filter: the screen still rejects the new keys (deterministic for
    // these fixed values — Spark's bloom hashing is deterministic)
    assert(msc.screen.get.positives(newHashes).isEmpty,
      "collect must not mutate the screen before apply")
    assert(bufs.asScala.map(_.length).sum == 2)
    msc.extendApply(bufs, 1L)
    assert(msc.screen.get.positives(newHashes).toSet == Set(100L, 200L))
    assert(msc.screen.get.positives(Seq(1L, 2L).toDF("h")).toSet == Set(1L, 2L),
      "original registry keys stay covered")
    // down screen: collect returns null, apply no-ops
    val dead = new MaintainedScreen("/graft-spec-nonexistent", 0,
      capacity = 0, fpp = 1e-6, "spec")
    assert(dead.extendCollect(newHashes) == null)
    dead.extendApply(null, 1L)
    assert(dead.screen.isEmpty)
    // saturation still drops through the split path
    val tiny = new MaintainedScreen("/graft-spec-nonexistent", 0,
      capacity = 8, fpp = 1e-6, "spec")
    tiny.refresh(fs, noDir, 0L,
      registryHashes = Seq(1L).toDF("h"),
      tailHashes = _ => fail("no bucket screen exists"))
    assert(tiny.screen.isDefined)
    val many = (1000L until 1500L).toDF("h")
    tiny.extendApply(tiny.extendCollect(many), 1L)
    assert(tiny.screen.isEmpty, "outgrown extension must drop the screen")
  }
}
