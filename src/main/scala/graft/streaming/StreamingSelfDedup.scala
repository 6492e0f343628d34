package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.util.sketch.BloomFilter

/** Streaming SELF-dedup substring clip (23rd route) — keep-first span
  * removal WITHIN an arriving stream: each micro-batch is clipped
  * against every n-gram the stream has already emitted (a maintained
  * gram-winner REGISTRY), plus the keep-first election among grams
  * first seen in this batch. The batch operator
  * ([[graft.dedup.Spans.clipSpans]]) answers "dedup this corpus"; this
  * route answers "dedup the corpus as it arrives" — the ingest-time
  * form, where a document's text is final the moment it is emitted.
  *
  * Semantics are PREFIX-CAUSAL and batch-boundary-independent (the
  * [[graft.dedup.Spans.clipSpansPrefixStep]] contract): the loser set
  * equals the batch operator's exactly; winner protection is limited
  * to intra-document duplication, because protection based on a
  * duplicate that has not arrived yet would require editing
  * already-emitted output. The whole stream therefore sits under the
  * exact full-corpus [[graft.dedup.Spans.clipSpansPrefixSql]] oracle
  * when fed in doc_id order.
  *
  * Scale shape: the registry is an append-only table of (xxhash64,
  * gram, batch_id) rows that grows for the life of the stream. Three
  * mechanisms keep the per-batch probe's cost from tracking that
  * growth:
  *   - `registryBuckets > 0` stores it as a HASH-BUCKETED catalog
  *     table (the [[StreamingBm25]] postings shape): each append
  *     writes bucket-aligned files, both registry joins cluster on
  *     `h`, so only the BATCH's seeds shuffle — the registry never
  *     re-partitions (StreamingSelfDedupSpec pins the exchange count);
  *   - a maintained BLOOM SCREEN over every registry hash (rebuilt
  *     from the registry on restart, extended with each batch's new
  *     grams): a batch none of whose seed hashes might be registered
  *     provably has zero registry hits, and the probe skips the
  *     registry SCAN entirely — clean batches cost O(batch), not
  *     O(stream lifetime). A false positive runs the exact join; the
  *     screen can never change an answer (no false negatives);
  *   - [[compactRegistry]] (bucket-preserving, crash-safe — the
  *     [[StreamingBm25.compact]] manifest protocol) folds the
  *     one-file-per-bucket-per-batch append residue back to ≤1 file
  *     per bucket, so a week-long stream's dirty-batch probe opens a
  *     bounded file count. Run it from the maintenance driver between
  *     batches (single-maintenance-writer contract).
  *
  * `registryBuckets = 0` appends a plain parquet dir — the
  * harness-scale form. Replays (at-least-once) re-emit deterministic
  * rows and may re-append registry rows; duplicates cannot change any
  * future clip (interval union is idempotent, the anti-join is
  * set-semantics, the bloom is a set union), so an idempotent sink
  * makes the route exactly-once.
  */
object StreamingSelfDedup {

  /** Catalog name for a bucketed registry at `registryDir` — derived
    * from the dir so concurrent streams in one session cannot collide.
    * XXH64 of the path bytes: a 32-bit hash over many long-lived
    * registry dirs has a real birthday-collision chance, and a
    * collision would silently cross-contaminate two streams' gram
    * registries. [[requireRegistryTable]] additionally verifies the
    * registered table's LOCATION, so even a 64-bit collision (or a
    * foreign table squatting on the name) fails loudly instead of
    * probing someone else's grams.
    */
  private[graft] def registryTableName(registryDir: String): String =
    BucketedRegistry.tableName("graft_selfdedup_reg", registryDir)

  /* Ops note (r13 name-scheme change): this derivation switched from
   * murmur32 to XXH64 in r13. With the in-memory catalog used
   * everywhere here nothing migrates — tables re-register per process.
   * A deployment on a PERSISTENT external metastore that registered a
   * registry under the old 8-hex-digit derived name will simply get a
   * second table registered over the same LOCATION while the stale
   * entry lingers; both read the same files (harmless), but drop the
   * legacy `graft_selfdedup_reg_<8 hex>` entry when upgrading to keep
   * the catalog clean. */

  /** Ensure the bucketed registry table for `registryDir` is
    * registered and safe to use — [[BucketedRegistry.requireTable]]
    * (marker validation + LOCATION guard) with the gram schema. The
    * checkpoint-resume path in a fresh session runs this before its
    * first probe, or the batch would silently probe an empty registry
    * and re-emit previously-clipped grams.
    */
  private[streaming] def requireRegistryTable(
      spark: SparkSession, registryDir: String, registryBuckets: Int): String =
    BucketedRegistry.requireTable(spark, registryDir, registryBuckets,
      "graft_selfdedup_reg", "h BIGINT, gram STRING, batch_id BIGINT", "h")

  /** Distributed bloom build over `df`'s `h` column. Two traps:
    * `stat.bloomFilter` NPEs on zero rows (the aggregate's zero-row
    * result is null) and the first batch's registry is legitimately
    * empty; and the build SILENTLY CLAMPS its bit count to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 2^26 = 8 MB) AND its item estimate to `...maxNumItems` (default
    * 4M — which skews the hash-function count: k is derived from the
    * clamped estimate, so a 30M-item build gets k≈149 and saturates
    * at expectedFpp ≈ 0.4 even with the right bit count). Raise both
    * confs to the requested geometry for the build's duration.
    * Verified post-build: a saturated filter is a silent no-op screen
    * that still costs a probe per seed — return None so the caller
    * DROPS the screen (graceful degradation to the always-exact path)
    * instead of trusting it.
    */
  private[graft] def bloomOver(df: DataFrame, capacity: Long,
                               fpp: Double): Option[BloomFilter] =
    if (df.isEmpty) Some(BloomFilter.create(capacity, fpp))
    else df.sparkSession.synchronized {
      // conf mutation scope: df.sparkSession inside foreachBatch is
      // the QUERY's cloned session (MicroBatchExecution clones at
      // start), so concurrent streams each mutate their own SQLConf —
      // no cross-stream snapshot/restore race. Two concurrent calls on
      // a SHARED interactive session would interleave the set/restore
      // pairs non-atomically — the synchronized-on-session block
      // serializes them (ENFORCED, not just documented: each build
      // then sees and restores a consistent prior).
      val conf = df.sparkSession.conf
      val wanted = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" ->
          BloomFilter.optimalNumOfBits(capacity, fpp),
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> capacity)
      val priors = wanted.map { case (k, v) =>
        val prior = conf.getOption(k)
        conf.set(k, math.max(prior.map(_.toLong).getOrElse(0L), v).toString)
        k -> prior
      }
      val built =
        try df.stat.bloomFilter(col("h"), capacity, fpp)
        finally priors.foreach {
          case (k, Some(v)) => conf.set(k, v)
          case (k, None) => conf.unset(k)
        }
      if (built.expectedFpp() <= ScreenUsableFpp) Some(built)
      else {
        Console.err.println(
          s"[graft] self-dedup screen disabled: registry outgrew " +
            s"screenCapacity=$capacity (bloom expectedFpp " +
            s"${built.expectedFpp()}) — batches take the exact path")
        None
      }
    }

  /** Screen lifecycle events (built / dropped / revived) in arrival
    * order — [[MaintainedScreen.events]], shared by every maintained-
    * screen route (specs assert on it; ops can drain it). Bounded.
    */
  private[graft] def screenEvents = MaintainedScreen.events

  /** The screen stops paying once its false-positive rate times a
    * batch's seed count approaches 1 (the skip is all-or-nothing per
    * batch): past this rate the filter is ballast, so the stream drops
    * it and every batch runs the exact join — a perf cliff, never a
    * correctness one.
    */
  private[graft] val ScreenUsableFpp = 1e-4

  /** Fold the registry's append residue (one file per bucket per
    * batch) back to ≤1 file per bucket, preserving bucket identity —
    * [[StreamingBm25.compact]]'s staged-manifest protocol, so a crash
    * mid-compaction is rolled forward and batch_id fencing rows
    * survive verbatim. Run between batches (single maintenance
    * writer, same contract as the postings table); returns the data
    * file count after compaction.
    */
  def compactRegistry(spark: SparkSession, registryDir: String,
                      registryBuckets: Int,
                      maxRecordsPerFile: Long = 0L,
                      minFileBytes: Long = 0L,
                      rebuildScreen: Boolean = false,
                      screenFpp: Double = 1e-6,
                      tierFanout: Int = 0): Int = {
    require(registryBuckets > 0, "only bucketed registries compact")
    val tbl = requireRegistryTable(spark, registryDir, registryBuckets)
    val n = StreamingBm25.compact(spark, tbl, registryDir, bucketCol = "h",
      numBuckets = registryBuckets, maxRecordsPerFile = maxRecordsPerFile,
      minFileBytes = minFileBytes, tierFanout = tierFanout)
    // refresh the per-bucket screens: EXTEND the existing blooms with
    // only the rows appended since the last build (cost ∝ tail, like
    // the tiered compaction above), full build when none exist or a
    // bucket saturates. The stream's next batch sees the new
    // covered_batch, rebuilds its (now small) tail bloom, and a screen
    // that had outgrown the driver capacity comes back — see
    // [[BucketScreen]]
    if (rebuildScreen)
      BucketScreen.extendOrBuild(spark, tbl, registryDir, registryBuckets,
        screenFpp)
    n
  }

  /** ZERO-DIAL maintenance window for the gram registry: compaction
    * floor/fanout and the screen extend-vs-full-rebuild decision all
    * derive from observed registry stats ([[MaintenancePolicy]] — the
    * lifecycle analog of the derived banding geometry). Bucket count
    * comes from the on-disk `_BUCKETS` contract. Returns the derived
    * plan (surface its `rebucketTo` recommendation — rebucketing stays
    * a deliberate stop-the-world event via [[rebucketRegistry]]), or
    * None until the registry exists.
    */
  def maintainRegistry(spark: SparkSession, registryDir: String,
                       bloomBudgetBytes: Long =
                         MaintenancePolicy.MaxBloomBytesPerBucket):
      Option[MaintenancePolicy.TablePlan] = {
    val root = new org.apache.hadoop.fs.Path(registryDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val buckets = BucketedRegistry.readBucketsMarker(fs, registryDir)
      .getOrElse(return None)
    val tbl = requireRegistryTable(spark, registryDir, buckets)
    Some(MaintenancePolicy.maintainTable(spark, tbl, registryDir, buckets,
      bucketCol = "h", withScreen = true,
      bloomBudgetBytes = bloomBudgetBytes))
  }

  /** Start the self-dedup clip over `stream`; `write` receives each
    * batch's (doc_id, clean_text, n_removed). `registryDir` holds the
    * maintained gram registry (created on first batch), as a plain
    * parquet dir (`registryBuckets = 0`) or an `h`-bucketed catalog
    * table (`> 0` — the scale form).
    *
    * `screenCapacity`/`screenFpp` size the maintained bloom screen
    * (0 capacity disables it). The screen is driver-held closure
    * state: rebuilt with ONE registry scan on (re)start, then extended
    * per batch by streaming the appended grams' 8-byte hashes to the
    * driver (cheaper than a distributed bloom build, whose partials
    * each weigh the full filter). When an on-disk [[BucketScreen]]
    * exists (built by [[compactRegistry]]`(rebuildScreen = true)` —
    * the beyond-driver-memory form), the driver bloom holds only the
    * TAIL of appends since the screen build; the bulk is probed on
    * executors, and an outgrown tail revives at the next rebuild. The default fpp is 1e-6, NOT the
    * conventional 1-3%: the skip is all-or-nothing per batch, so the
    * expected false positives per batch (fpp × batch seed count) must
    * sit well under 1 or the skip never fires — at 1e-6 a 100k-seed
    * batch skips with probability ~0.9 and the filter still costs only
    * ~3.6 bytes/gram. A registry that outgrows the capacity only
    * degrades the false-positive rate (more batches pay the exact
    * join), never correctness. A replayed batch re-puts the same
    * hashes — a set-union no-op.
    */
  def clipStream(stream: DataFrame, idCol: Column, textCol: Column,
                 minTokens: Int, registryDir: String,
                 checkpointDir: Option[String] = None,
                 registryBuckets: Int = 0,
                 screenCapacity: Long = 4L * 1000 * 1000,
                 screenFpp: Double = 1e-6)
                (write: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream
      .select(idCol.cast("long").as("doc_id"),
        textCol.cast("string").as("text"))
      .writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    val tbl = registryTableName(registryDir)
    // the maintained screen: whole-registry driver bloom, or (once a
    // BucketScreen is built by compactRegistry(rebuildScreen=true))
    // executor bucket blooms + a driver TAIL bloom — see
    // [[MaintainedScreen]]. foreachBatch bodies run sequentially on
    // the stream execution thread, so the closure state (inside
    // MaintainedScreen and registryValidated) needs no synchronization.
    val maintained = new MaintainedScreen(registryDir, registryBuckets,
      screenCapacity, screenFpp, "self-dedup")
    // marker + LOCATION validation is immutable per (dir, buckets)
    // under the single-writer contract — validate once per closure
    // lifetime, re-validating only if the table vanishes (a dropped
    // catalog entry, the fresh-session simulation), instead of paying
    // 3-4 metadata RPCs per micro-batch forever
    var registryValidated = false
    // the gram length IS part of the on-disk contract, exactly like a
    // band route's geometry: a resume with a different minTokens emits
    // grams that never match the registered ones, silently re-emitting
    // every previously-clipped span — validate-or-stamp like _BUCKETS
    val geometry = Map("kind" -> "substring-clip",
      "min_tokens" -> minTokens.toString)
    var geomOk = false
    val query = writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      // a DIRTY batch pushes its screen-positive hash set into the
      // registry scan as `h IN (…)` (Spans.clipSpansPrefixStep) —
      // raise the parquet IN-pushdown threshold so it reaches the
      // h-sorted files' row-group/page stats
      MaintainedScreen.raiseInPushdown(s)
      val regPath = new org.apache.hadoop.fs.Path(registryDir)
      val fs = regPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      // gram-length contract BEFORE the first probe (see `geometry`).
      // A pre-existing dir with no marker is a legacy registry — the
      // stamp is a trusted act, logged loudly so the operator can audit
      // the locked-in gram length against the stream that created it
      if (!geomOk && fs.exists(regPath)) {
        BucketedRegistry.requireGeometry(fs, registryDir, geometry,
          onMissing = BucketedRegistry.MissingGeometry.StampTrusted)
        geomOk = true
      }
      // batch-id fencing makes the REPLAY correct, not just tolerated:
      // a crash after the registry append but before the offset commit
      // re-runs this batch with its own grams already in the registry
      // — without the fence the replay would clip the batch's own
      // first occurrences as "already seen". Probing only rows from
      // STRICTLY EARLIER batches makes the replayed view identical to
      // the original run's; the duplicate append re-lands under the
      // same batch_id and stays invisible to every later probe's
      // `< batchId` filter... (it IS visible to batch_id+1 — exactly
      // once, as the original rows would have been).
      val registry =
        if (registryBuckets > 0 && fs.exists(regPath)) {
          if (!registryValidated || !s.catalog.tableExists(tbl)) {
            requireRegistryTable(s, registryDir, registryBuckets)
            registryValidated = true
          }
          // this batch must see the previous batch's append: refresh
          // the (micro-batch-session) catalog's cached file listing
          s.catalog.refreshTable(tbl)
          s.table(tbl).where(col("batch_id") < batchId).select("h", "gram")
        } else if (registryBuckets == 0 && fs.exists(regPath))
          s.read.parquet(registryDir)
            .where(col("batch_id") < batchId).select("h", "gram")
        else {
          import s.implicits._
          Seq.empty[(Long, String)].toDF("h", "gram")
        }
      // (re)build / revive the screen for this batch — see
      // [[MaintainedScreen.refresh]]: with an on-disk bucket screen
      // the driver only rebuilds the small tail (row-group stats on
      // the compacted files skip the bulk, so the scan costs ∝ tail),
      // and a dead screen comes back once maintenance rebuilds past
      // the covered batch it died under — no stream restart.
      maintained.refresh(fs, regPath, batchId,
        registryHashes = registry.select(col("h")),
        tailHashes = covered => s.table(tbl)
          .where(col("batch_id") > covered && col("batch_id") < batchId)
          .select(col("h")))
      val (clipped, newGrams, release) =
        graft.dedup.Spans.clipSpansPrefixStepScreened(
          batch, col("doc_id"), col("text"), registry, minTokens,
          maintained.screen)
      // cache the appended frame for the batch: the registry append
      // and the bloom extension both consume it, and without the cache
      // the second consumer re-runs the distinct's shuffle
      val out = newGrams.select(col("h"), col("gram"),
        lit(batchId).as("batch_id")).persist()
      try {
        // the clipped-output write, the registry append, and the
        // screen extension's collect job are independent given the
        // step's pinned frames: overlap all three
        // (SelfRegistryDedup.inParallel3 — sink on this thread, append
        // + collect on the pool). A sink failure after the append
        // landed replays under the batch-id fence exactly like the
        // documented crash-after-append case; the duplicate append
        // re-lands under the same batch_id, invisible to every later
        // probe. The extension's filter MUTATION stays strictly after
        // the append (extendApply below) — a key the screen covers but
        // the registry lost would be a false negative.
        var extBufs: java.util.List[Array[Long]] = null
        SelfRegistryDedup.inParallel3(write(clipped),
        if (registryBuckets > 0) {
          // marker FIRST: a crash between the append and a
          // marker-after write would leave bucket-named files with no
          // recorded count — the unvalidated-resume hole the marker
          // exists to close. An extra marker next to zero data files
          // is harmless (the registry reads empty). Then the guard —
          // writing the marker created the dir, so requireRegistryTable
          // runs even on the FIRST append and a squatter on the
          // derived name fails loudly BEFORE receiving this batch's
          // rows (saveAsTable appends into an existing table's own
          // location, ignoring the path option).
          BucketedRegistry.writeBucketsMarkerIfAbsent(
            fs, registryDir, registryBuckets)
          if (!geomOk) { // stamp the fresh registry's gram length
            BucketedRegistry.requireGeometry(fs, registryDir, geometry)
            geomOk = true
          }
          if (!registryValidated || !s.catalog.tableExists(tbl)) {
            requireRegistryTable(s, registryDir, registryBuckets)
            registryValidated = true
          }
          // repartition by the BUCKET ID before the bucketed append:
          // the writer emits one file per (task, bucket) pair, so an
          // un-repartitioned batch appends (partitions × buckets)
          // files — measured 15,650 litter files where the design
          // said 512 (32× the listing/footer cost at every probe,
          // compaction, and screen build). Grouping each bucket whole
          // into one task (pmod(murmur3, n) — the writer's own bucket
          // id) restores the ≤1-file-per-bucket-per-batch contract
          // for one batch-bounded shuffle.
          out.repartition(registryBuckets,
              org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.hash(col("h")),
                lit(registryBuckets)))
            .write.mode("append").format("parquet")
            .option("path", registryDir)
            .bucketBy(registryBuckets, "h").sortBy("h")
            .saveAsTable(tbl)
        } else {
          out.write.mode("append").parquet(registryDir)
          if (!geomOk) { // plain-dir registries carry the contract too
            BucketedRegistry.requireGeometry(fs, registryDir, geometry)
            geomOk = true
          }
        }, {
          extBufs = maintained.extendCollect(out.select(col("h")))
        })
        // extend, don't rebuild: stream the pinned new grams' hashes
        // to the driver (8 bytes each — a distributed build's partial
        // aggregates each weigh the FULL filter; collected above,
        // overlapped with the sink+append); an extension that
        // saturates the screen drops it (revived at the next rebuild)
        maintained.extendApply(extBufs, batchId)
      } finally {
        out.unpersist(blocking = false)
        release()
      }
      ()
    }.start()
    // single-writer guard: rebucketRegistry refuses while this query
    // is active in the same JVM
    BucketedRegistry.registerStream(registryDir, query)
    query
  }

  /** Rewrite the gram registry at `newBuckets` buckets — see
    * [[BucketedRegistry.rebucket]] (staged-manifest, roll-forward,
    * refuses under a live same-JVM stream). Re-registers the catalog
    * table at the new count; `rebuildScreen` rebuilds the per-bucket
    * [[BucketScreen]] the rebucket necessarily staled.
    */
  def rebucketRegistry(spark: SparkSession, registryDir: String,
                       newBuckets: Int, rebuildScreen: Boolean = false,
                       screenFpp: Double = 1e-6): Unit = {
    BucketedRegistry.rebucket(spark, registryDir, "graft_selfdedup_reg",
      "h", newBuckets)
    val fs = new Path(registryDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(registryDir))) {
      val tbl = requireRegistryTable(spark, registryDir, newBuckets)
      if (rebuildScreen)
        BucketScreen.build(spark, tbl, registryDir, newBuckets, screenFpp)
    }
  }
}
