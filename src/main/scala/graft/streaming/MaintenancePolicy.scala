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
    * item; the rows/bucket where one bucket's bloom hits the 256 MiB
    * single-task budget.
    */
  val MaxRowsPerBucket: Long =
    (MaxBloomBytesPerBucket * 8L / 28.76).toLong // ≈ 74.7M

  /** What is on disk for one bucketed registry table. */
  final case class TableStats(
      buckets: Int, rows: Long, dataFiles: Int, dataBytes: Long,
      batches: Long, screen: Option[BucketScreen.Meta], deltaRows: Long)

  /** The derived decisions for one maintenance window. */
  final case class TablePlan(
      tierFloorBytes: Long, tierFanout: Int, fullScreenBuild: Boolean,
      rebucketTo: Option[Int])

  /** Observe `table` (registered, bucketed, batch_id-fenced) at `dir`.
    * One metadata listing + one aggregate scan; `deltaRows` scans only
    * `batch_id > base_covered` (row-group stats skip the bulk on
    * compacted files) and only when a screen meta exists.
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
    val agg = spark.table(table)
      .agg(count(lit(1)).as("n"), max(col("batch_id")).as("m")).collect()(0)
    val rows = agg.getLong(0)
    val batches = if (agg.isNullAt(1)) 0L else agg.getLong(1) + 1L
    val meta = BucketScreen.readMeta(fs, dir).filter(_.buckets == buckets)
    val deltaRows = meta.fold(0L) { m =>
      spark.table(table).where(col("batch_id") > m.baseCovered).count()
    }
    TableStats(buckets, rows, files.size, files.map(_.getLen).sum,
      batches, meta, deltaRows)
  }

  /** Pure derivation — unit-testable at any synthetic scale. */
  def plan(stats: TableStats): TablePlan = {
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
    val rebucketTo =
      if (stats.buckets <= 0 ||
          stats.rows / stats.buckets <= MaxRowsPerBucket) None
      else {
        var b = stats.buckets.toLong
        while (stats.rows / b > MaxRowsPerBucket) b *= 2
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
                    buckets: Int, bucketCol: String,
                    withScreen: Boolean): TablePlan = {
    val stats = statsFor(spark, table, dir, buckets)
    val p = plan(stats)
    StreamingBm25.compact(spark, table, dir, bucketCol = bucketCol,
      numBuckets = buckets, minFileBytes = p.tierFloorBytes,
      tierFanout = p.tierFanout)
    if (withScreen) {
      if (p.fullScreenBuild)
        BucketScreen.build(spark, table, dir, buckets, ScreenFpp,
          keyCol = bucketCol)
      else
        BucketScreen.extendOrBuild(spark, table, dir, buckets, ScreenFpp,
          keyCol = bucketCol)
    }
    p.rebucketTo.foreach { n =>
      Console.err.println(s"[graft] maintenance policy: registry at " +
        s"$dir holds ~${stats.rows / math.max(buckets, 1)} rows/bucket " +
        s"(> $MaxRowsPerBucket); RECOMMEND rebucket to $n buckets at " +
        "the next stream restart (stop-the-world table rewrite)")
    }
    p
  }
}
