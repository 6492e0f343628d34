package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.dedup.SeedScreen

/** Per-bucket Bloom screens stored BESIDE the bucketed gram registry —
  * the beyond-driver-memory form of [[StreamingSelfDedup]]'s clean/
  * dirty-batch screen. The driver-held whole-registry bloom has a hard
  * ceiling: at 1e-6 fpp it costs ~3.6 bytes/gram, so a 100 TB stream's
  * billions of registry grams would put tens of GB on the driver, and
  * outgrowing the configured capacity used to drop the screen FOREVER.
  * This splits the screen in two tiers:
  *
  *   - **bucket blooms** (`<registryDir>/_screen/bloom-NNNNN.bin`, one
  *     per hash bucket): built DISTRIBUTED during
  *     [[StreamingSelfDedup.compactRegistry]] — each bucket's filter
  *     is built whole in one task and written executor-side, so
  *     nothing registry-sized ever transits the driver. At probe time
  *     a batch's seed hashes shuffle to their buckets (O(batch)) and
  *     each task probes only the filters for the buckets it holds,
  *     through a JVM-local cache keyed by (path, mtime) — the screen
  *     scales with executors, the driver holds none of it;
  *   - **tail bloom** (driver-held, [[StreamingSelfDedup.bloomOver]]):
  *     covers only registry rows appended AFTER the screen build
  *     (`batch_id > covered_batch` — row-group stats on the compacted
  *     files skip the bulk, so the restart rebuild also costs ∝ tail),
  *     extended per batch exactly like the whole-registry bloom was.
  *     Its capacity now only needs to hold inter-compaction growth,
  *     and outgrowing it is RECOVERABLE: the next screen rebuild folds
  *     the tail into the bucket blooms and the stream revives the
  *     screen — a bounded perf dip, no longer a permanent cliff.
  *
  * No false negatives by construction: every registry hash is covered
  * by exactly one tier (build-time rows by their bucket bloom, later
  * appends by the tail), and a replayed batch's own `batch_id ==
  * current` rows can only ADD false positives, which the pushed
  * `h IN (…)` probe then filters with the exact join.
  *
  * The `_screen` / `_screen_stage` names start with an underscore, so
  * Spark's file listing never surfaces them as data. Builds are
  * crash-safe by staging: blooms + meta land in `_screen_stage`, then
  * the stage is swapped in (delete old, rename). A crash mid-swap
  * leaves no `_screen` — the stream falls back to the whole-registry
  * driver bloom, a perf event only.
  */
object BucketScreen {

  /** Screen manifest: bucket count (must equal the registry's), the
    * max registry `batch_id` the bucket blooms cover (the tail starts
    * after it), and the build geometry for diagnostics.
    */
  final case class Meta(buckets: Int, coveredBatch: Long, fpp: Double,
                        capacityPerBucket: Long)

  /** The SESSION's hadoop conf, shipped to executor closures via
    * hadoop's own Writable form: a bare `new Configuration()` on the
    * executor loses every session-applied fs setting (object-store
    * credentials, endpoints) — fine on local/default-HDFS, wrong on
    * the 100 TB deployment this screen exists for. (Spark's internal
    * SerializableConfiguration is private[spark].)
    */
  private def confBytes(conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    conf.write(out)
    out.close()
    bos.toByteArray
  }

  private def confFrom(bytes: Array[Byte]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    c.readFields(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    c
  }

  private def screenPath(registryDir: String) = new Path(registryDir, "_screen")
  private def stagePath(registryDir: String) = new Path(registryDir, "_screen_stage")
  private def bloomName(b: Int) = f"bloom-$b%05d.bin"

  /** Delete stranded `*.tmp-extend*` files in the live screen dir —
    * losing task attempts' blooms and the residue of a driver crash
    * between [[extend]]'s collect and its swap. Safe at any time in
    * the maintenance window: nothing reads tmp names, and the live
    * `bloom-NNNNN.bin` / `meta` files never match.
    */
  private def sweepExtendTmps(fs: FileSystem, registryDir: String): Unit = {
    val dir = screenPath(registryDir)
    if (fs.exists(dir))
      fs.listStatus(dir).foreach { st =>
        if (st.isFile && st.getPath.getName.contains(".tmp-extend"))
          fs.delete(st.getPath, false)
      }
  }

  def readMeta(fs: FileSystem, registryDir: String): Option[Meta] = {
    val p = new Path(screenPath(registryDir), "meta")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
      val kv = txt.linesIterator.map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      Some(Meta(kv("buckets").toInt, kv("covered_batch").toLong,
        kv("fpp").toDouble, kv("capacity_per_bucket").toLong))
    }
  }

  /** Build the per-bucket blooms over the registry table's CURRENT
    * contents and swap them in. Run from the maintenance driver right
    * after [[StreamingSelfDedup.compactRegistry]] (single-writer
    * window, same contract). Returns the covered batch id, or None if
    * any bucket's filter would saturate (stage discarded, any existing
    * screen left intact — it stays correct because the tail covers
    * everything after ITS covered_batch).
    */
  def build(spark: SparkSession, table: String, registryDir: String,
            buckets: Int, fpp: Double = 1e-6,
            keyCol: String = "h"): Option[Long] = {
    require(buckets > 0, "bucket screens need a bucketed registry")
    spark.catalog.refreshTable(table)
    val agg = spark.table(table)
      .agg(count(lit(1)).as("n"), max(col("batch_id")).as("m")).collect()(0)
    val total = agg.getLong(0)
    val covered = if (agg.isNullAt(1)) -1L else agg.getLong(1)
    // row count bounds distinct-hash count, so capacity sized from it
    // can only overshoot (lower fpp); +30% headroom, small floor
    val capacity = math.max(total / buckets * 13L / 10L + 64L, 1024L)
    val root = new Path(registryDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = stagePath(registryDir)
    fs.delete(stage, true)
    fs.mkdirs(stage)
    val stageStr = stage.toString
    import spark.implicits._
    // session hadoop conf to the write tasks (see confBytes)
    val hconf = confBytes(spark.sessionState.newHadoopConf())
    // group rows by BUCKET ID so each bucket's bloom is built whole in
    // one task and written from that task — the full screen (which
    // scales with registry cardinality) never exists in one place
    val built = spark.table(table).select(col(keyCol).as("h"))
      .withColumn("b", pmod(hash(col("h")), lit(buckets)))
      .repartition(buckets, col("b"))
      .mapPartitions { it =>
        val blooms = scala.collection.mutable.HashMap.empty[Int, BloomFilter]
        it.foreach { r =>
          blooms.getOrElseUpdate(r.getInt(1), BloomFilter.create(capacity, fpp))
            .putLong(r.getLong(0))
        }
        val conf = confFrom(hconf)
        blooms.iterator.map { case (b, bf) =>
          val p = new Path(stageStr, bloomName(b))
          val out = p.getFileSystem(conf).create(p, true)
          try bf.writeTo(out) finally out.close()
          (b, bf.expectedFpp())
        }
      }.collect()
    if (built.exists(_._2 > StreamingSelfDedup.ScreenUsableFpp)) {
      Console.err.println(s"[graft] bucket-screen build aborted: " +
        s"${built.count(_._2 > StreamingSelfDedup.ScreenUsableFpp)} " +
        s"bucket filters would saturate at capacity=$capacity")
      fs.delete(stage, true)
      return None
    }
    // empty buckets still get a (tiny, all-negative) bloom: a probe
    // finding a MISSING file must be able to fail loudly instead of
    // guessing between "empty bucket" and "screen swept away"
    val present = built.map(_._1).toSet
    (0 until buckets).filterNot(present).foreach { b =>
      val out = fs.create(new Path(stage, bloomName(b)), true)
      try BloomFilter.create(64, fpp).writeTo(out) finally out.close()
    }
    val meta = new Path(stage, "meta")
    val out = fs.create(meta, true)
    try out.write(
      (s"buckets=$buckets\ncovered_batch=$covered\nfpp=$fpp\n" +
        s"capacity_per_bucket=$capacity\n").getBytes("UTF-8"))
    finally out.close()
    // swap: a crash between delete and rename leaves NO screen — the
    // stream degrades to the whole-registry driver bloom, perf only
    fs.delete(screenPath(registryDir), true)
    if (!fs.rename(stage, screenPath(registryDir)))
      throw new java.io.IOException(
        s"bucket-screen swap failed: rename $stage -> " +
          s"${screenPath(registryDir)} returned false")
    Some(covered)
  }

  /** Fold ONLY the registry rows appended after the screen's covered
    * batch into the EXISTING bucket blooms — the incremental form of
    * [[build]], making screen maintenance cost track new data like
    * size-tiered compaction does: the registry scan is `batch_id >
    * covered_batch` (row-group stats on the compacted files skip the
    * bulk), and per-bucket bloom I/O is the screen's own bytes (~3.6
    * per gram at 1e-6), not the data's. Tasks write each extended
    * bloom to a `.tmp-extend` sibling; the driver swaps them in ONLY
    * after every bucket validated under [[StreamingSelfDedup
    * .ScreenUsableFpp]], then advances the meta (temp-then-rename)
    * LAST. Crash anywhere: extended blooms can only ADD positives and
    * the un-advanced meta keeps the driver tail covering everything
    * after the OLD covered batch — a superset screen, never a false
    * negative. Returns the new covered batch id; None when there is
    * no compatible screen or any bucket's filter would saturate at
    * its build-time capacity (tmps discarded — the caller falls back
    * to a full [[build]], which re-sizes capacity from the table).
    */
  def extend(spark: SparkSession, table: String, registryDir: String,
             buckets: Int, keyCol: String = "h"): Option[Long] = {
    val root = new Path(registryDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = readMeta(fs, registryDir).filter(_.buckets == buckets)
      .getOrElse(return None)
    // a driver crash between the task collect and the swap (or losing
    // task attempts — see the attempt-unique names below) strands
    // `.tmp-extend-*` files in the live screen dir; nothing later ever
    // reads them, so reap them here before writing fresh ones
    sweepExtendTmps(fs, registryDir)
    spark.catalog.refreshTable(table)
    val tail = spark.table(table).where(col("batch_id") > meta.coveredBatch)
    val agg = tail.agg(count(lit(1)).as("n"), max(col("batch_id")).as("m"))
      .collect()(0)
    if (agg.getLong(0) == 0L) return Some(meta.coveredBatch)
    val newCovered = agg.getLong(1)
    val hconf = confBytes(spark.sessionState.newHadoopConf())
    val dir = screenPath(registryDir).toString
    import spark.implicits._
    val extended = tail.select(col(keyCol).as("h"))
      .withColumn("b", pmod(hash(col("h")), lit(buckets)))
      .repartition(buckets, col("b"))
      .mapPartitions { it =>
        val conf = confFrom(hconf)
        val blooms = scala.collection.mutable.HashMap.empty[Int, BloomFilter]
        it.foreach { r =>
          val b = r.getInt(1)
          val bf = blooms.getOrElseUpdate(b, {
            val p = new Path(dir, bloomName(b))
            val in = p.getFileSystem(conf).open(p)
            try BloomFilter.readFrom(in) finally in.close()
          })
          bf.putLong(r.getLong(0))
        }
        // attempt-unique tmp names: a speculative or retried attempt
        // writing the SAME fixed tmp path could interleave with another
        // attempt's stream, and the driver would then install a
        // corrupt-but-parseable bloom (silent false negatives). Each
        // attempt writes its own file; exactly one attempt per
        // partition wins the collect, and the driver renames only the
        // winner's files (losers are reaped by sweepExtendTmps).
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        blooms.iterator.map { case (b, bf) =>
          val name = s".${bloomName(b)}.tmp-extend-$attempt"
          val p = new Path(dir, name)
          val out = p.getFileSystem(conf).create(p, true)
          try bf.writeTo(out) finally out.close()
          (b, bf.expectedFpp(), name)
        }
      }.collect()
    if (extended.exists(_._2 > StreamingSelfDedup.ScreenUsableFpp)) {
      Console.err.println(s"[graft] bucket-screen extend aborted: " +
        s"${extended.count(_._2 > StreamingSelfDedup.ScreenUsableFpp)} " +
        s"bucket filters would saturate at their build-time capacity=" +
        s"${meta.capacityPerBucket} - falling back to a full rebuild")
      sweepExtendTmps(fs, registryDir)
      return None
    }
    // swap per file (delete + rename; maintenance-window contract —
    // same visibility window the full build's dir swap has), meta last
    extended.foreach { case (b, _, tmpName) =>
      val dst = new Path(dir, bloomName(b))
      fs.delete(dst, false)
      if (!fs.rename(new Path(dir, tmpName), dst))
        throw new java.io.IOException(
          s"bucket-screen extend swap failed for bucket $b")
    }
    sweepExtendTmps(fs, registryDir) // losing attempts' files
    val metaTmp = new Path(dir, ".meta.tmp-extend")
    val out = fs.create(metaTmp, true)
    try out.write(
      (s"buckets=$buckets\ncovered_batch=$newCovered\nfpp=${meta.fpp}\n" +
        s"capacity_per_bucket=${meta.capacityPerBucket}\n").getBytes("UTF-8"))
    finally out.close()
    val metaDst = new Path(dir, "meta")
    fs.delete(metaDst, false)
    if (!fs.rename(metaTmp, metaDst))
      throw new java.io.IOException("bucket-screen extend meta swap failed")
    Some(newCovered)
  }

  /** [[extend]] when a compatible screen exists (cost ∝ tail),
    * [[build]] otherwise or on saturation (cost ∝ registry, re-sizes
    * capacity) — what registry maintenance should call.
    */
  def extendOrBuild(spark: SparkSession, table: String, registryDir: String,
                    buckets: Int, fpp: Double = 1e-6,
                    keyCol: String = "h"): Option[Long] =
    extend(spark, table, registryDir, buckets, keyCol)
      .orElse(build(spark, table, registryDir, buckets, fpp, keyCol))

  /** JVM-local (executor-side) cache of deserialized bucket blooms,
    * keyed by (file path, mtime) so a rebuilt screen is picked up on
    * its first probe. Bounded crudely: a full clear past 1024 entries
    * (dozens of concurrent registries × their buckets fit long before
    * that; a clear only costs re-reads).
    */
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), BloomFilter]()

  private def cachedBloom(screenDir: String, b: Int,
                          conf: org.apache.hadoop.conf.Configuration): BloomFilter = {
    val p = new Path(screenDir, bloomName(b))
    val fs = p.getFileSystem(conf)
    val mtime = fs.getFileStatus(p).getModificationTime
    if (bloomCache.size > 1024) bloomCache.clear()
    bloomCache.computeIfAbsent((p.toString, mtime), { _ =>
      val in = fs.open(p)
      try BloomFilter.readFrom(in) finally in.close()
    })
  }

  /** The two-tier [[SeedScreen]]: seed hashes shuffle to their buckets
    * and probe the executor-cached bucket blooms (positives collected
    * to the driver — bounded by hits + fpp × batch), unioned with the
    * driver-held TAIL probe over `tailMightContain`. `registryDir` is
    * re-resolved per probe, so a screen rebuilt by maintenance between
    * batches is picked up without restarting the stream.
    */
  def probe(registryDir: String, buckets: Int,
            tailMightContain: Long => Boolean): SeedScreen = new SeedScreen {
    def positives(seedHashes: DataFrame): Array[Long] = {
      val spark = seedHashes.sparkSession
      val dir = screenPath(registryDir).toString
      import spark.implicits._
      // session hadoop conf to the probe tasks (see confBytes)
      val hconf = confBytes(spark.sessionState.newHadoopConf())
      val bucketLeg = seedHashes.select(col("h"))
        .withColumn("b", pmod(hash(col("h")), lit(buckets)))
        .repartition(buckets, col("b"))
        .mapPartitions { it =>
          val conf = confFrom(hconf)
          val loaded = scala.collection.mutable.HashMap.empty[Int, BloomFilter]
          val emitted = scala.collection.mutable.HashSet.empty[Long]
          it.flatMap { r =>
            val h = r.getLong(0)
            val bf = loaded.getOrElseUpdate(r.getInt(1),
              cachedBloom(dir, r.getInt(1), conf))
            if (bf.mightContainLong(h) && emitted.add(h)) Iterator.single(h)
            else Iterator.empty
          }
        }.collect()
      val tail = SeedScreen.fromDriverProbe(tailMightContain)
        .positives(seedHashes)
      (bucketLeg.toSet ++ tail).toArray.sorted
    }
  }
}
