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
  * This splits the screen in three tiers:
  *
  *   - **base bucket blooms** (`<registryDir>/_screen/bloom-NNNNN
  *     .bin`, one per hash bucket): built DISTRIBUTED during
  *     [[StreamingSelfDedup.compactRegistry]] — each bucket's filter
  *     is built whole in one task and written executor-side, so
  *     nothing registry-sized ever transits the driver. At probe time
  *     a batch's seed hashes shuffle to their buckets (O(batch)) and
  *     each task probes only the filters for the buckets it holds,
  *     through a JVM-local cache keyed by (path, mtime) — the screen
  *     scales with executors, the driver holds none of it;
  *   - **delta bucket blooms** (`bloom-NNNNN.delta.bin`, written by
  *     [[extend]]): cover registry rows in `(base_covered,
  *     covered_batch]` — incremental screen maintenance without
  *     touching the base. The r14 form extended by rewriting each
  *     touched BASE bloom whole, so maintenance I/O was the screen's
  *     own bytes (1.4 GB at 300M registry rows, ~28 GB at 3B); the
  *     delta is sized to rows since the last full build, so per-window
  *     I/O tracks NEW DATA on both axes (tail scan via batch_id
  *     row-group stats + delta-sized bloom bytes). A delta that
  *     outgrows its capacity rebuilds in place from one
  *     `batch_id > base_covered` scan at a re-sized capacity
  *     (geometric ⇒ amortized ∝ rows since base); full [[build]]s at
  *     major-compaction cadence fold it back into the base;
  *   - **tail bloom** (driver-held, [[StreamingSelfDedup.bloomOver]]):
  *     covers only registry rows appended AFTER `covered_batch`,
  *     extended per batch exactly like the whole-registry bloom was.
  *     Its capacity now only needs to hold inter-compaction growth,
  *     and outgrowing it is RECOVERABLE: the next screen rebuild folds
  *     the tail into the on-disk tiers and the stream revives the
  *     screen — a bounded perf dip, no longer a permanent cliff.
  *
  * No false negatives by construction: every registry hash is covered
  * by at least one tier (rows ≤ base_covered by their base bloom,
  * (base_covered, covered_batch] by the delta, later appends by the
  * tail), and a replayed batch's own `batch_id == current` rows can
  * only ADD false positives, which the pushed `h IN (…)` probe then
  * filters with the exact join.
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
    * max registry `batch_id` the ON-DISK screen covers (the driver
    * tail starts after it), the batch id the BASE blooms cover (the
    * per-bucket delta blooms cover `(baseCovered, coveredBatch]` —
    * equal means no deltas), and the build geometry for diagnostics.
    */
  final case class Meta(buckets: Int, coveredBatch: Long, fpp: Double,
                        capacityPerBucket: Long, baseCovered: Long)

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
  private def deltaName(b: Int) = f"bloom-$b%05d.delta.bin"

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
      val covered = kv("covered_batch").toLong
      Some(Meta(kv("buckets").toInt, covered,
        kv("fpp").toDouble, kv("capacity_per_bucket").toLong,
        // pre-delta screens (no base_covered line) have no delta tier:
        // the base blooms cover everything up to covered_batch
        kv.get("base_covered").map(_.toLong).getOrElse(covered)))
    }
  }

  private def writeMeta(fs: FileSystem, dir: Path, tmpSuffix: String,
                        m: Meta): Unit = {
    val tmp = new Path(dir, s".meta$tmpSuffix")
    val out = fs.create(tmp, true)
    try out.write(
      (s"buckets=${m.buckets}\ncovered_batch=${m.coveredBatch}\n" +
        s"fpp=${m.fpp}\ncapacity_per_bucket=${m.capacityPerBucket}\n" +
        s"base_covered=${m.baseCovered}\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(dir, "meta")
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"bucket-screen meta swap failed at $dir")
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
    // cross-process single-maintenance-writer for the screen swap
    val lease = MaintenanceLease.acquire(fs, registryDir)
    try {
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
    // the O(registry) per-bucket bloom job is the op's long pole:
    // refresh the lease so a build slower than the TTL is never taken
    // over mid-flight (takeover → abort at validate → retry → repeat:
    // a livelock the heartbeat removes)
    MaintenanceLease.heartbeat(fs, lease)
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
        s"capacity_per_bucket=$capacity\nbase_covered=$covered\n")
        .getBytes("UTF-8"))
    finally out.close()
    // swap: a crash between delete and rename leaves NO screen — the
    // stream degrades to the whole-registry driver bloom, perf only.
    // Validate first: a lost lease means another writer owns the dir
    // now — abandon the stage rather than swap over its work
    MaintenanceLease.validate(fs, lease)
    fs.delete(screenPath(registryDir), true)
    if (!fs.rename(stage, screenPath(registryDir)))
      throw new java.io.IOException(
        s"bucket-screen swap failed: rename $stage -> " +
          s"${screenPath(registryDir)} returned false")
    Some(covered)
    } finally MaintenanceLease.release(fs, lease)
  }

  /** Per-bucket bloom write of `rows`' key hashes into attempt-unique
    * `.tmp-extend-<attempt>` DELTA files. `readExisting` seeds each
    * bucket from its live delta (the incremental put); otherwise
    * buckets start fresh at `freshCapacity` (the rebuild / first-delta
    * path). Attempt-unique names: a speculative or retried attempt
    * writing one fixed tmp path could interleave with another
    * attempt's stream and the driver would install a
    * corrupt-but-parseable bloom (silent false negatives) — each
    * attempt writes its own file, exactly one attempt per partition
    * wins the collect, and only the winners' files are renamed
    * (losers are reaped by [[sweepExtendTmps]]). Returns (bucket,
    * expectedFpp, tmpName) per touched bucket.
    */
  private def writeDeltaTmps(spark: SparkSession, rows: DataFrame,
                             dir: String, buckets: Int, keyCol: String,
                             fpp: Double, freshCapacity: Long,
                             readExisting: Boolean): Array[(Int, Double, String)] = {
    val hconf = confBytes(spark.sessionState.newHadoopConf())
    import spark.implicits._
    rows.select(col(keyCol).as("h"))
      .withColumn("b", pmod(hash(col("h")), lit(buckets)))
      .repartition(buckets, col("b"))
      .mapPartitions { it =>
        val conf = confFrom(hconf)
        val blooms = scala.collection.mutable.HashMap.empty[Int, BloomFilter]
        it.foreach { r =>
          val b = r.getInt(1)
          val bf = blooms.getOrElseUpdate(b, {
            val p = new Path(dir, deltaName(b))
            val fsx = p.getFileSystem(conf)
            if (readExisting && fsx.exists(p)) {
              val in = fsx.open(p)
              try BloomFilter.readFrom(in) finally in.close()
            } else BloomFilter.create(freshCapacity, fpp)
          })
          bf.putLong(r.getLong(0))
        }
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        blooms.iterator.map { case (b, bf) =>
          val name = s".${deltaName(b)}.tmp-extend-$attempt"
          val p = new Path(dir, name)
          val out = p.getFileSystem(conf).create(p, true)
          try bf.writeTo(out) finally out.close()
          (b, bf.expectedFpp(), name)
        }
      }.collect()
  }

  /** Fold ONLY the registry rows appended after the screen's covered
    * batch into per-bucket DELTA blooms beside the base blooms — the
    * incremental form of [[build]], with maintenance I/O ∝ NEW DATA on
    * both axes: the registry scan is `batch_id > covered_batch`
    * (row-group stats on the compacted files skip the bulk), and the
    * bloom bytes read + written are the DELTA's (sized to rows since
    * the last full build), never the base screen's. The r14 form
    * rewrote each touched base bloom whole — at 300M registry rows
    * that is 1.4 GB of bloom I/O per maintenance window, at 3B rows
    * ~28 GB; deltas cut that to the tail's own bytes. A delta that
    * outgrows its capacity is REBUILT in place from one scan of
    * `batch_id > base_covered` at a capacity re-sized from the actual
    * row count (geometric growth ⇒ amortized ∝ rows since base);
    * folding the delta back into the base is [[build]], which
    * maintenance runs at major-compaction cadence. Coverage invariant
    * (no false negatives): base covers `≤ base_covered`, the delta
    * covers `(base_covered, covered_batch]`, the driver tail covers
    * everything after — the meta advances (temp-then-rename) LAST, so
    * a crash anywhere leaves a superset screen. Returns the new
    * covered batch id; None when no compatible screen exists or even
    * the re-sized delta saturates (the caller falls back to a full
    * [[build]]).
    */
  def extend(spark: SparkSession, table: String, registryDir: String,
             buckets: Int, keyCol: String = "h"): Option[Long] = {
    val root = new Path(registryDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = readMeta(fs, registryDir).filter(_.buckets == buckets)
      .getOrElse(return None)
    // cross-process single-maintenance-writer for the delta swaps
    val lease = MaintenanceLease.acquire(fs, registryDir)
    try {
    // a driver crash between the task collect and the swap (or losing
    // task attempts) strands `.tmp-extend-*` files in the live screen
    // dir; nothing later ever reads them — reap before writing fresh
    sweepExtendTmps(fs, registryDir)
    spark.catalog.refreshTable(table)
    val tail = spark.table(table).where(col("batch_id") > meta.coveredBatch)
    val agg = tail.agg(count(lit(1)).as("n"), max(col("batch_id")).as("m"))
      .collect()(0)
    if (agg.getLong(0) == 0L) return Some(meta.coveredBatch)
    val newCovered = agg.getLong(1)
    val dir = screenPath(registryDir).toString
    val haveDelta = meta.coveredBatch > meta.baseCovered
    // fresh deltas (first extend after a build) sized from THIS tail
    // with 3x headroom so the next few windows extend in place before
    // the first re-size
    val freshCap = math.max(agg.getLong(0) / buckets * 3L + 64L, 4096L)
    val incremental = writeDeltaTmps(spark, tail, dir, buckets, keyCol,
      meta.fpp, freshCap, readExisting = haveDelta)
    val written =
      if (incremental.forall(_._2 <= StreamingSelfDedup.ScreenUsableFpp))
        Some(incremental)
      else {
        // the delta outgrew its capacity: rebuild the DELTA TIER from
        // one scan of everything after the base (old delta rows + this
        // tail), re-sized from the actual count — cost ∝ rows since
        // the last full build, not the registry
        sweepExtendTmps(fs, registryDir)
        val deltaRows = spark.table(table)
          .where(col("batch_id") > meta.baseCovered)
        val dn = deltaRows.agg(count(lit(1))).collect()(0).getLong(0)
        val cap = math.max(dn / buckets * 13L / 10L + 64L, 4096L)
        Console.err.println(s"[graft] bucket-screen delta re-sized to " +
          s"capacity=$cap from $dn delta-tier rows")
        val rebuilt = writeDeltaTmps(spark, deltaRows, dir, buckets,
          keyCol, meta.fpp, cap, readExisting = false)
        if (rebuilt.forall(_._2 <= StreamingSelfDedup.ScreenUsableFpp))
          Some(rebuilt)
        else None
      }
    // delta writes done (the op's long pole — the re-size path scans
    // the whole delta tier): refresh the lease before the swaps
    MaintenanceLease.heartbeat(fs, lease)
    written match {
      case None =>
        Console.err.println("[graft] bucket-screen extend aborted: a " +
          "re-sized delta still saturates (pathological bucket skew) - " +
          "falling back to a full rebuild")
        sweepExtendTmps(fs, registryDir)
        None
      case Some(tmps) =>
        // swap per file (delete + rename; maintenance-window contract —
        // same visibility window the full build's dir swap has). A
        // lost lease aborts before the first swap — tmp litter only
        MaintenanceLease.validate(fs, lease)
        tmps.foreach { case (b, _, tmpName) =>
          val dst = new Path(dir, deltaName(b))
          fs.delete(dst, false)
          if (!fs.rename(new Path(dir, tmpName), dst))
            throw new java.io.IOException(
              s"bucket-screen delta swap failed for bucket $b")
        }
        sweepExtendTmps(fs, registryDir) // losing attempts' files
        // every bucket must carry a delta file once the meta says the
        // delta tier exists — the probe loads them unconditionally and
        // a missing file must keep meaning "screen swept away", not
        // "bucket had no tail rows". Temp-then-rename like every other
        // screen write: a crash mid-create at the LIVE path would leave
        // a truncated-but-present delta that wedges every later probe/
        // extend of the bucket until a full build replaces the screen
        (0 until buckets).foreach { b =>
          val p = new Path(dir, deltaName(b))
          if (!fs.exists(p)) {
            val tmp = new Path(dir, s".${deltaName(b)}.tmp-extend-ph")
            val out = fs.create(tmp, true)
            try BloomFilter.create(64, meta.fpp).writeTo(out)
            finally out.close()
            if (!fs.rename(tmp, p))
              throw new java.io.IOException(
                s"bucket-screen placeholder delta rename failed for bucket $b")
          }
        }
        // meta LAST: crash before this line leaves the old covered
        // batch, so the driver tail still covers the rows the new
        // delta bits also cover — a superset, never a false negative
        writeMeta(fs, new Path(dir), ".tmp-extend",
          meta.copy(coveredBatch = newCovered))
        Some(newCovered)
    }
    } finally MaintenanceLease.release(fs, lease)
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
    * its first probe. Access-ordered LRU bounded at [[BloomCacheMax]]
    * entries: with many live registries per executor, evicting the
    * least-recently-probed bloom keeps every ACTIVE registry's working
    * set hot, where the previous clear-everything-past-the-bound form
    * thrashed all probes' caches at once. Eviction only costs a
    * re-read. Guarded by its own monitor (LinkedHashMap's access-order
    * bookkeeping mutates on get, so even reads need exclusion); probe
    * tasks hold it only for map ops, never across a filesystem read.
    */
  private[streaming] val BloomCacheMax = 1024

  private val bloomCache =
    new java.util.LinkedHashMap[(String, Long), BloomFilter](
      64, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), BloomFilter]): Boolean =
        size() > BloomCacheMax
    }

  /** Current cache keys, LRU-first — a diagnostic seam for the
    * eviction spec (and ops), not a hot-path API.
    */
  private[streaming] def bloomCacheKeys: Seq[(String, Long)] =
    bloomCache.synchronized {
      import scala.jdk.CollectionConverters._
      bloomCache.keySet().asScala.toList
    }

  private[streaming] def bloomCacheClear(): Unit =
    bloomCache.synchronized(bloomCache.clear())

  private[streaming] def cachedBloom(screenDir: String, name: String,
                          conf: org.apache.hadoop.conf.Configuration): BloomFilter = {
    val p = new Path(screenDir, name)
    val fs = p.getFileSystem(conf)
    val mtime = fs.getFileStatus(p).getModificationTime
    val key = (p.toString, mtime)
    val hit = bloomCache.synchronized(bloomCache.get(key))
    if (hit != null) hit
    else {
      // read OUTSIDE the monitor (a slow object-store read must not
      // block every other bucket's probe); a racing double-read of the
      // same bloom is benign — last put wins, both are identical bytes
      val in = fs.open(p)
      val bf = try BloomFilter.readFrom(in) finally in.close()
      bloomCache.synchronized(bloomCache.put(key, bf))
      bf
    }
  }

  /** The two-tier [[SeedScreen]]: seed hashes shuffle to their buckets
    * and probe the executor-cached bucket blooms (positives collected
    * to the driver — bounded by hits + fpp × batch), unioned with the
    * driver-held TAIL probe over `tailMightContain`. `probeDeltas` is
    * fixed at screen-(re)build time from the meta (`covered_batch >
    * base_covered`): a delta tier created by LATER maintenance is
    * still covered by this stream's live driver tail (which keeps
    * covering everything after the covered batch it was built
    * against), so skipping it can only cost false positives never
    * false negatives — and the probe never trusts a per-probe meta
    * read whose delete→rename window could transiently vanish.
    */
  def probe(registryDir: String, buckets: Int, probeDeltas: Boolean,
            tailMightContain: Long => Boolean): SeedScreen = new SeedScreen {
    def positives(seedHashes: DataFrame): Array[Long] = {
      val spark = seedHashes.sparkSession
      val dir = screenPath(registryDir).toString
      // local copy: referencing the method param from inside the task
      // lambda would capture it through this (non-serializable)
      // anonymous SeedScreen instance
      val withDeltas = probeDeltas
      import spark.implicits._
      // session hadoop conf to the probe tasks (see confBytes)
      val hconf = confBytes(spark.sessionState.newHadoopConf())
      val bucketLeg = seedHashes.select(col("h"))
        .withColumn("b", pmod(hash(col("h")), lit(buckets)))
        .repartition(buckets, col("b"))
        .mapPartitions { it =>
          val conf = confFrom(hconf)
          val loaded = scala.collection.mutable
            .HashMap.empty[Int, (BloomFilter, BloomFilter)]
          val emitted = scala.collection.mutable.HashSet.empty[Long]
          it.flatMap { r =>
            val h = r.getLong(0)
            val (base, delta) = loaded.getOrElseUpdate(r.getInt(1), {
              val b = r.getInt(1)
              (cachedBloom(dir, bloomName(b), conf),
                if (withDeltas) cachedBloom(dir, deltaName(b), conf)
                else null)
            })
            val hit = base.mightContainLong(h) ||
              (delta != null && delta.mightContainLong(h))
            if (hit && emitted.add(h)) Iterator.single(h)
            else Iterator.empty
          }
        }.collect()
      val tail = SeedScreen.fromDriverProbe(tailMightContain)
        .positives(seedHashes)
      (bucketLeg.toSet ++ tail).toArray.sorted
    }
  }
}
