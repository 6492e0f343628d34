package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, SeedScreen, ShingleKernel, Spans}

/** Streaming SELF near-dup detection (24th route) — MinHash/LSH
  * deduplication of a stream AGAINST ITSELF: each arriving document is
  * checked against every document the stream has already admitted, via
  * a maintained on-disk BAND REGISTRY that grows with the stream. The
  * batch operator ([[graft.dedup.Dedup.minhashPairs]]) answers "find
  * near-dup pairs in this corpus"; [[StreamingDedup]] answers "is this
  * new document a near-copy of a FIXED corpus"; this route answers the
  * continuous-ingest form of the first: "is this new document a
  * near-copy of anything that has EVER streamed past" — keep-first
  * semantics, the shape a 100 TB training-data ingest actually runs
  * (NewDoc → near-dup of history? drop : admit+register).
  *
  * Semantics are PREFIX-CAUSAL like [[StreamingSelfDedup]]: a document
  * is compared against strictly earlier documents (earlier batches via
  * the registry, earlier ids within its own batch via a batch-local
  * band join), so feeding a corpus in id order reproduces the batch
  * operator's keep-earliest verdicts exactly — the whole stream sits
  * under a full-corpus exact-Jaccard oracle.
  *
  * Emitted per input document: `(id, dup_of, jaccard)` where `dup_of`
  * is the SMALLEST earlier id whose verified exact Jaccard clears
  * `minJaccard` (null for admitted documents) and `jaccard` is that
  * pair's value. LSH recall caveats are the batch operator's own:
  * a qualifying pair is found iff some band collides (identical
  * shingle sets always collide; the 8×8 banding catches J ≳ 0.77 with
  * high probability).
  *
  * Scale shape — the same three mechanisms as [[StreamingSelfDedup]],
  * applied to two registries under `registryDir`:
  *   - `bands/`: (band_key, id, batch_id), hash-bucketed + sorted on
  *     `band_key` — the probe side. Only the BATCH's band keys
  *     shuffle; the registry never re-partitions.
  *   - `docs/`: (id, sh, batch_id), bucketed on `id` — shingle-hash
  *     sets fetched ONLY for band-colliding candidate ids (never
  *     scanned whole; the candidates join clusters on `id`).
  *   - a [[MaintainedScreen]] over the band keys: a batch none of
  *     whose band keys might be registered provably has zero
  *     historical candidates — the bands scan is skipped entirely
  *     (and with zero candidates the docs join folds away with it).
  *     A dirty batch pushes its screen-positive band keys into the
  *     bands scan as `band_key IN (…)`, paying ∝ collisions.
  *   - [[compact]] folds both tables' per-batch append residue
  *     (optionally size-tiered) and can rebuild the bucket screen.
  *
  * Batch-id fencing as in [[StreamingSelfDedup.clipStream]]: probes
  * see strictly-earlier batches only, so an at-least-once replay
  * re-emits identical verdicts and the duplicate append stays
  * invisible to later probes.
  */
object StreamingNearDup {

  private def bandsDir(registryDir: String) = s"$registryDir/bands"
  private def docsDir(registryDir: String) = s"$registryDir/docs"

  private[graft] def bandsTableName(registryDir: String): String =
    BucketedRegistry.tableName("graft_neardup_bands", bandsDir(registryDir))
  private[graft] def docsTableName(registryDir: String): String =
    BucketedRegistry.tableName("graft_neardup_docs", docsDir(registryDir))

  private def requireBandsTable(s: SparkSession, registryDir: String,
                                buckets: Int): String =
    BucketedRegistry.requireTable(s, bandsDir(registryDir), buckets,
      "graft_neardup_bands", "band_key BIGINT, id BIGINT, batch_id BIGINT",
      "band_key")

  private def requireDocsTable(s: SparkSession, registryDir: String,
                               buckets: Int): String =
    BucketedRegistry.requireTable(s, docsDir(registryDir), buckets,
      "graft_neardup_docs", "id BIGINT, sh ARRAY<BIGINT>, batch_id BIGINT",
      "id")

  /** Fold both registries' append residue back toward ≤1 file per
    * bucket ([[StreamingBm25.compact]]'s staged-manifest protocol;
    * `minFileBytes` makes it size-tiered) and optionally rebuild the
    * band registry's [[BucketScreen]] so the stream's maintained
    * screen revives/upgrades at its next batch. Run between batches
    * (single maintenance writer).
    */
  def compact(spark: SparkSession, registryDir: String, buckets: Int,
              minFileBytes: Long = 0L, rebuildScreen: Boolean = false,
              screenFpp: Double = 1e-6): Unit = {
    val bt = requireBandsTable(spark, registryDir, buckets)
    StreamingBm25.compact(spark, bt, bandsDir(registryDir),
      bucketCol = "band_key", numBuckets = buckets,
      minFileBytes = minFileBytes)
    val dt = requireDocsTable(spark, registryDir, buckets)
    StreamingBm25.compact(spark, dt, docsDir(registryDir),
      bucketCol = "id", numBuckets = buckets, minFileBytes = minFileBytes)
    if (rebuildScreen)
      BucketScreen.extendOrBuild(spark, bt, bandsDir(registryDir), buckets,
        screenFpp, keyCol = "band_key")
  }

  /** Start the self near-dup check over `stream`; `write` receives
    * each batch's `(id, dup_of, jaccard)` — every input document, with
    * `dup_of`/`jaccard` null for admitted (non-duplicate) documents.
    * The registries are created under `registryDir` on first batch.
    * `screenCapacity`/`screenFpp` size the maintained band-key screen
    * (0 disables it); see [[StreamingSelfDedup.clipStream]] for the
    * fpp sizing argument (the skip is all-or-nothing per batch).
    *
    * `registerDups = false` registers only ADMITTED documents — the
    * keep-first production setting, where the registry grows with
    * UNIQUE content instead of stream volume (a boilerplate-heavy
    * corpus's dup orbit adds one registrant, not thousands). Verdicts
    * then compare against surviving keepers only: a transitive chain
    * A≈B, B≈C with A≉C admits C (B was never registered) — the
    * standard keep-first transitivity tradeoff, while identical
    * orbits still resolve to their keeper (the keeper collides with
    * every member). Within-batch candidates are unaffected (the
    * batch-local join sees all earlier-in-batch rows either way). The
    * default `true` matches the all-pairs batch operator exactly and
    * sits under the gate's oracle.
    */
  def nearDupStream(stream: DataFrame, idCol: Column, textCol: Column,
                    registryDir: String,
                    checkpointDir: Option[String] = None,
                    buckets: Int = 8, shingleN: Int = 3,
                    minJaccard: Double = 0.9,
                    screenCapacity: Long = 4L * 1000 * 1000,
                    screenFpp: Double = 1e-6,
                    registerDups: Boolean = true)
                   (write: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream
      .select(idCol.cast("long").as("id"), textCol.cast("string").as("text"))
      .writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    val bDir = bandsDir(registryDir)
    val dDir = docsDir(registryDir)
    val maintained = new MaintainedScreen(bDir, buckets,
      screenCapacity, screenFpp, "near-dup")
    var validated = false
    writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      MaintainedScreen.raiseInPushdown(s)
      val bPath = new org.apache.hadoop.fs.Path(bDir)
      val fs = bPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val bTbl = bandsTableName(registryDir)
      val dTbl = docsTableName(registryDir)
      val exists = fs.exists(bPath)
      if (exists && (!validated || !s.catalog.tableExists(bTbl) ||
          !s.catalog.tableExists(dTbl))) {
        requireBandsTable(s, registryDir, buckets)
        requireDocsTable(s, registryDir, buckets)
        validated = true
      }
      if (exists) {
        // this batch must see the previous batch's append: refresh the
        // (micro-batch-session) catalog's cached file listings
        s.catalog.refreshTable(bTbl)
        s.catalog.refreshTable(dTbl)
      }
      // one pass over the batch computes everything reused below
      // (bands probe both sides, shingle sets for verification, both
      // appends, the screen extension) — pin it for the batch
      val base = batch
        .withColumn("sh", Dedup.shingleHashes(col("text"), shingleN))
        .withColumn("bands", ShingleKernel.bandHash64(
          Dedup.minhashSignatureFromHashes(col("sh")), Dedup.NumBands))
        .select(col("id"), col("sh"), col("bands"))
        .persist()
      try {
        val batchBands = base.select(col("id"), explode(col("bands"))
          .as("band_key"))
        val bandsReg =
          if (exists) s.table(bTbl).where(col("batch_id") < batchId)
            .select("band_key", "id")
          else {
            import s.implicits._
            Seq.empty[(Long, Long)].toDF("band_key", "id")
          }
        val docsReg =
          if (exists) s.table(dTbl).where(col("batch_id") < batchId)
            .select("id", "sh")
          else base.limit(0).select("id", "sh")
        maintained.refresh(fs, bPath, batchId,
          registryHashes = bandsReg.select(col("band_key").as("h")),
          tailHashes = covered => s.table(bTbl)
            .where(col("batch_id") > covered && col("batch_id") < batchId)
            .select(col("band_key").as("h")))
        // screen fast path (same contract as the gram registry's):
        // empty positive set ⇒ both registry scans fold away; a small
        // positive set is pushed into the bands scan as `IN (…)`
        val probedBands = maintained.screen match {
          case Some(sc) =>
            val positives = sc.positives(
              batchBands.select(col("band_key").as("h")))
            if (positives.isEmpty) bandsReg.limit(0)
            else if (positives.length > Spans.ScreenPushLimit) bandsReg
            else bandsReg.where(
              col("band_key").isin(positives.toIndexedSeq: _*))
          case None => bandsReg
        }
        // historical candidates: band-colliding (new id, earlier id)
        // pairs; distinct is batch-bounded (collisions per batch).
        // Pinned: consumed by the candidate-id collect below AND the
        // verification join
        val crossCand = batchBands
          .join(probedBands.withColumnRenamed("id", "cand_id"), "band_key")
          .select(col("id"), col("cand_id")).distinct()
          .persist()
        // the docs fetch must not scan the registry either: a
        // broadcast join of few candidates against the docs table
        // still READS every docs row — an O(registry) term per dirty
        // batch the band screen cannot remove. Collect the candidate
        // ids (bounded by this batch's band collisions; a clean batch
        // is a statically-empty relation and costs nothing) and push
        // `id IN (…)` into the bucketed docs scan — bucket pruning +
        // the id-sorted files' row-group stats skip every uninvolved
        // doc. Past the push limit the batch is substantially
        // duplicate and the full fetch is the cheaper plan (the
        // ScreenPushLimit rationale).
        val candIds = crossCand.select(col("cand_id")).distinct()
          .limit(Spans.ScreenPushLimit + 1).collect().map(_.getLong(0))
        val docsFetch =
          if (candIds.isEmpty) docsReg.limit(0)
          else if (candIds.length > Spans.ScreenPushLimit) docsReg
          else docsReg.where(col("id").isin(candIds.toIndexedSeq: _*))
        val crossPairs = crossCand
          .join(docsFetch.select(col("id").as("cand_id"),
            col("sh").as("cand_sh")), Seq("cand_id"))
          .join(base.select(col("id"), col("sh")), Seq("id"))
        // within-batch candidates: earlier id in the SAME batch (the
        // registry only holds strictly earlier batches)
        val selfPairs = batchBands.as("a")
          .join(batchBands.as("b"),
            col("a.band_key") === col("b.band_key") &&
              col("b.id") < col("a.id"))
          .select(col("a.id").as("id"), col("b.id").as("cand_id")).distinct()
          .join(base.select(col("id").as("cand_id"), col("sh").as("cand_sh")),
            Seq("cand_id"))
          .join(base.select(col("id"), col("sh")), Seq("id"))
        val verified = crossPairs.unionByName(selfPairs)
          .select(col("id"), col("cand_id"),
            Dedup.jaccardSorted(col("sh"), col("cand_sh")).as("jaccard"))
          .where(col("jaccard") >= minJaccard)
        // keep-earliest verdict: the SMALLEST qualifying earlier id
        // (struct min orders by cand_id first), carrying ITS jaccard
        val best = verified.groupBy("id")
          .agg(min(struct(col("cand_id"), col("jaccard"))).as("m"))
          .select(col("id"), col("m.cand_id").as("dup_of"),
            col("m.jaccard").as("jaccard"))
          .persist() // batch-bounded; consumed by the output AND (in
                     // keep-first mode) the registration anti-join
        try {
          val out = base.select(col("id")).join(best, Seq("id"), "left")
            .select(col("id"), col("dup_of"), col("jaccard"))
          write(out)
          // registration scope: everything (the oracle-exact default)
          // or admitted documents only (keep-first production — the
          // registry grows with unique content, not stream volume)
          val registrants =
            if (registerDups) base
            else base.join(best.select(col("id")), Seq("id"), "left_anti")
          val registrantBands = registrants
            .select(col("id"), explode(col("bands")).as("band_key"))
          // appends, marker-first per table (see clipStream's ordering
          // argument); both fenced under this batch's id for replays
          BucketedRegistry.writeBucketsMarkerIfAbsent(fs, bDir, buckets)
          BucketedRegistry.writeBucketsMarkerIfAbsent(fs, dDir, buckets)
          if (!validated || !s.catalog.tableExists(bTbl) ||
              !s.catalog.tableExists(dTbl)) {
            requireBandsTable(s, registryDir, buckets)
            requireDocsTable(s, registryDir, buckets)
            validated = true
          }
          // repartition by the BUCKET ID first: one file per bucket per
          // batch instead of (partitions × buckets) — see clipStream's
          // append for the measured 32× litter consequence
          registrantBands.withColumn("batch_id", lit(batchId))
            .repartition(buckets, pmod(hash(col("band_key")), lit(buckets)))
            .write.mode("append").format("parquet").option("path", bDir)
            .bucketBy(buckets, "band_key").sortBy("band_key")
            .saveAsTable(bTbl)
          registrants.select(col("id"), col("sh"), lit(batchId).as("batch_id"))
            .repartition(buckets, pmod(hash(col("id")), lit(buckets)))
            .write.mode("append").format("parquet").option("path", dDir)
            .bucketBy(buckets, "id").sortBy("id")
            .saveAsTable(dTbl)
          maintained.extend(
            registrantBands.select(col("band_key").as("h")).distinct(), batchId)
        } finally {
          best.unpersist(blocking = false)
          crossCand.unpersist(blocking = false)
        }
      } finally base.unpersist(blocking = false)
      ()
    }.start()
  }
}
