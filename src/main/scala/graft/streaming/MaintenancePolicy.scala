package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Registry maintenance policy DERIVED from observed registry stats —
  * the lifecycle analog of the banding-geometry derivation
  * ([[graft.dedup.Dedup.geometryFor]]): callers stop choosing
  * compaction floors, tier fanouts, screen cadences, and rebucket
  * moments, because a mis-set dial silently degrades to O(registry)
  * maintenance windows, saturated screens, or starved probe
  * parallelism. Every trigger below is a function of what is ON DISK.
  *
  * Derivations (constants are derived once with stated rationale, not
  * remembered per call site):
  *
  *   - **Tier fanout K = 4.** The multi-tier LSM merge keeps
  *     files/bucket ≤ K·log_K W and rewrites every byte ≤ log_K W
  *     times over W windows. K·log_K W = K/ln K · ln W is minimized at
  *     K = e; the integer choices 3 and 4 are within 6% of each other,
  *     and K = 4 halves write amplification vs K = 2 (log₄ = ½·log₂)
  *     while keeping at most 4 same-tier files waiting per bucket —
  *     the COMPACTPROBE_r15 sawtooth (2–8 files/bucket over 30
  *     windows) ran at exactly this fanout.
  *
  *   - **Tier floor = 4 × the observed per-(batch, bucket) append
  *     bytes**, clamped to [64 KiB, 64 MiB]. Appends land one file per
  *     bucket per batch, so the observed table bytes ÷ batches ÷
  *     buckets IS the litter size the floor exists to classify; 4× of
  *     it means a fresh window's merge output immediately clears the
  *     floor and enters tier 0 instead of being re-merged as litter
  *     every window (re-merging until the output outgrows a too-high
  *     floor is exactly the O(registry)-per-window failure the floor
  *     guards against). The clamps bound pathology: tiny test
  *     registries still tier, and no floor grows past the point where
  *     "litter" is itself a well-formed tier file.
  *
  *   - **Full screen build when the delta tier exceeds 25% of the
  *     base.** [[BucketScreen.extend]] keeps maintenance I/O ∝ new
  *     data, but the delta blooms' bytes and false-positive budget
  *     track rows since the last full build; folding them into the
  *     base costs one O(registry) pass. Rebuilding at 25% growth keeps
  *     total screen bytes within 1.25× of optimal while amortizing the
  *     O(registry) build over ≥ 4 maintenance windows of growth —
  *     geometric, so lifetime build cost stays ∝ total data. No meta
  *     at all (fresh or swept screen) ⇒ build.
  *
  *   - **Rebucket when a bucket's base bloom would exceed 256 MiB.**
  *     Each bucket's base bloom is built whole in ONE task
  *     ([[BucketScreen.build]]); at fpp 1e-6 that is ~28.8 bits ≈ 3.6
  *     bytes per row, so 256 MiB ≈ 74M rows per bucket — past it,
  *     single-task build memory and probe-time bloom loads stop being
  *     healthy, and probe/compaction parallelism (per bucket) has
  *     outgrown the layout anyway. The recommendation doubles the
  *     bucket count until back under budget. Rebucketing is
  *     stop-the-world (O(table) rewrite + the stream must restart with
  *     the new count), so [[plan]] RECOMMENDS it and
  *     `SelfRegistryDedup.maintain` reports it loudly rather than
  *     firing it behind a live stream's back.
  */
object MaintenancePolicy {

  val TierFanout = 4
  val TierFloorMinBytes: Long = 64L << 10
  val TierFloorMaxBytes: Long = 64L << 20
  val ScreenDeltaRebuildFraction = 0.25
  val MaxBloomBytesPerBucket: Long = 256L << 20
  val ScreenFpp = 1e-6

  /** At fpp 1e-6 a Bloom filter needs -ln(fpp)/ln²2 ≈ 28.76 bits per
    * item; the rows/bucket where one bucket's bloom hits the given
    * single-task byte budget.
    */
  def maxRowsPerBucket(bloomBudgetBytes: Long): Long =
    (bloomBudgetBytes * 8L / 28.76).toLong

  /** The derived default budget's boundary ≈ 74.7M rows/bucket. */
  val MaxRowsPerBucket: Long = maxRowsPerBucket(MaxBloomBytesPerBucket)

  /** What is on disk for one bucketed registry table. `batches` is the
    * count of DISTINCT batch ids present — not max+1, which a
    * pre-seeded registry (batch_id = -1 bulk loads) or an offset id
    * history would collapse to 0 or overcount, zeroing the per-append
    * estimate the tier floor derives from.
    */
  final case class TableStats(
      buckets: Int, rows: Long, dataFiles: Int, dataBytes: Long,
      batches: Long, screen: Option[BucketScreen.Meta], deltaRows: Long)

  /** The derived decisions for one maintenance window. */
  final case class TablePlan(
      tierFloorBytes: Long, tierFanout: Int, fullScreenBuild: Boolean,
      rebucketTo: Option[Int])

  /** Observe `table` (registered, bucketed, batch_id-fenced) at `dir`.
    * One metadata listing + ONE aggregate scan: row count, distinct
    * batch ids, and (when a screen meta exists) the conditional
    * `batch_id > base_covered` delta count all fold into a single pass
    * over the `batch_id` column — the whole-table count already reads
    * it, so a second row-group-pruned delta scan would only add I/O.
    */
  def statsFor(spark: SparkSession, table: String, dir: String,
               buckets: Int): TableStats = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (fs.exists(root))
        fs.listStatus(root).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      else Seq.empty
    spark.catalog.refreshTable(table)
    val meta = BucketScreen.readMeta(fs, dir).filter(_.buckets == buckets)
    val aggCols =
      Seq(count(lit(1)).as("n"),
        countDistinct(col("batch_id")).as("b")) ++
      meta.map(m =>
        count(when(col("batch_id") > m.baseCovered, lit(1))).as("d"))
    val agg = spark.table(table)
      .agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val deltaRows = if (meta.isDefined) agg.getLong(2) else 0L
    TableStats(buckets, agg.getLong(0), files.size,
      files.map(_.getLen).sum, agg.getLong(1), meta, deltaRows)
  }

  /** Pure derivation — unit-testable at any synthetic scale.
    * `bloomBudgetBytes` is the per-task memory envelope the rebucket
    * trigger derives its rows/bucket boundary from: defaulted to the
    * 256 MiB single-task budget, overridable ONLY because the envelope
    * is a property of the deployment's executors, not of the data —
    * every trigger still derives from on-disk stats.
    */
  def plan(stats: TableStats,
           bloomBudgetBytes: Long = MaxBloomBytesPerBucket): TablePlan = {
    val perAppendBytes =
      if (stats.batches <= 0 || stats.buckets <= 0) 0L
      else stats.dataBytes / stats.batches / stats.buckets
    val floor = math.min(TierFloorMaxBytes,
      math.max(TierFloorMinBytes, 4L * perAppendBytes))
    val fullBuild = stats.screen match {
      case None => true
      case Some(_) =>
        val base = math.max(stats.rows - stats.deltaRows, 1L)
        stats.deltaRows.toDouble / base > ScreenDeltaRebuildFraction
    }
    val maxRows = maxRowsPerBucket(bloomBudgetBytes)
    val rebucketTo =
      if (stats.buckets <= 0 ||
          stats.rows / stats.buckets <= maxRows) None
      else {
        var b = stats.buckets.toLong
        while (stats.rows / b > maxRows) b *= 2
        Some(b.toInt)
      }
    TablePlan(floor, TierFanout, fullBuild, rebucketTo)
  }

  /** One table's full maintenance window under the derived plan:
    * size-tiered multi-tier compaction, then screen extend-or-build
    * per the delta-fraction trigger (when `withScreen`). Returns the
    * plan actually applied, with the rebucket recommendation for the
    * caller to surface — rebucketing itself stays a deliberate
    * maintenance-scale event (see the class doc).
    */
  def maintainTable(spark: SparkSession, table: String, dir: String,
                    buckets: Int, bucketCol: String, withScreen: Boolean,
                    bloomBudgetBytes: Long = MaxBloomBytesPerBucket):
      TablePlan = {
    val t0 = System.nanoTime()
    val stats = statsFor(spark, table, dir, buckets)
    val p = plan(stats, bloomBudgetBytes)
    StreamingBm25.compact(spark, table, dir, bucketCol = bucketCol,
      numBuckets = buckets, minFileBytes = p.tierFloorBytes,
      tierFanout = p.tierFanout)
    val screenOp =
      if (!withScreen) "none"
      else if (p.fullScreenBuild) {
        BucketScreen.build(spark, table, dir, buckets, ScreenFpp,
          keyCol = bucketCol)
        "build"
      } else {
        BucketScreen.extendOrBuild(spark, table, dir, buckets, ScreenFpp,
          keyCol = bucketCol)
        "extend"
      }
    p.rebucketTo.foreach { n =>
      Console.err.println(s"[graft] maintenance policy: registry at " +
        s"$dir holds ~${stats.rows / math.max(buckets, 1)} rows/bucket " +
        s"(> ${maxRowsPerBucket(bloomBudgetBytes)}); RECOMMEND rebucket " +
        s"to $n buckets at the next stream restart (stop-the-world " +
        "table rewrite)")
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(dir)))
      MaintenanceLog.append(fs, dir,
        s"""{"ts_ms":${System.currentTimeMillis()},"table":"$table",""" +
        s""""buckets":${stats.buckets},"rows":${stats.rows},""" +
        s""""data_files":${stats.dataFiles},""" +
        s""""data_bytes":${stats.dataBytes},"batches":${stats.batches},""" +
        s""""delta_rows":${stats.deltaRows},""" +
        s""""screen_covered":${
          stats.screen.map(_.coveredBatch).getOrElse(-1L)},""" +
        s""""tier_floor_bytes":${p.tierFloorBytes},""" +
        s""""tier_fanout":${p.tierFanout},"screen_op":"$screenOp",""" +
        s""""full_screen_build":${p.fullScreenBuild},""" +
        s""""rebucket_to":${p.rebucketTo.getOrElse(0)},""" +
        f""""secs":$secs%.3f,"holder":"${MaintenanceLease.holderId}"}""")
    p
  }
}
