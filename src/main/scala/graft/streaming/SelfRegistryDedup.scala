package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Spans

/** The shared engine under the streaming SELF-dedup-by-banding routes
  * ([[StreamingNearDup]]: MinHash bands over shingle sets;
  * [[StreamingEmbDedup]]: hyperplane sign bands over embeddings) —
  * "is this new item a near-copy of anything that has EVER streamed
  * past", as one parameterized core instead of two near-copies:
  *
  *   - TWO bucketed registries under `registryDir`: `bands/`
  *     (band_key, id, batch_id — the probe side, bucketed+sorted on
  *     `band_key`) and a feature store (id, <feature>, batch_id —
  *     bucketed on `id`, fetched ONLY for band-colliding candidates);
  *   - a [[MaintainedScreen]] over the band keys (clean batches fold
  *     both registry scans away; dirty batches push their screen-
  *     positive band keys into the bands scan as `band_key IN (…)`);
  *   - the candidate-id `id IN (…)` push into the feature fetch
  *     (bounded by the batch's band collisions — a broadcast join of
  *     few candidates against the feature table would still READ
  *     every row);
  *   - batch-id fencing for at-least-once replays, keep-earliest
  *     verdicts via exact verification, optional keep-first
  *     registration, size-tiered compaction + screen extend/rebuild.
  *
  * The kinds differ only in the feature column (name + DDL type), the
  * band computation, and the exact verification expression — exactly
  * the [[Kind]] + `featurize` + `verify` parameters.
  */
private[streaming] object SelfRegistryDedup {

  /** Run two independent write actions as concurrent Spark jobs
    * (overlap-independent-jobs: the second job's tasks back-fill
    * executor slots the first's tail leaves idle, and its driver-side
    * analysis/commit runs while the first's tasks execute). `b` runs
    * on a daemon pool thread, `a` on the calling thread; the await
    * sits in a finally so neither failure path leaves an in-flight
    * write behind — `a`'s exception wins, else `b`'s surfaces, and
    * the batch retry replays both idempotently under the batch-id
    * fence either way.
    */
  private[streaming] def inParallel[A](a: => A, b: => Unit): A = {
    val fb = scala.concurrent.Future(b)(appendEc)
    val ra =
      try a
      finally scala.concurrent.Await.ready(
        fb, scala.concurrent.duration.Duration.Inf)
    fb.value.get.get
    ra
  }

  /** Three-way [[inParallel]]: `a` on the calling (stream) thread,
    * `b` and `c` on pool threads — used to overlap the sink write, the
    * registry appends, and the screen-extension collect job (which
    * reads only batch-pinned frames; its filter mutation happens
    * strictly after, see [[MaintainedScreen.extendCollect]]). Both
    * awaits sit in a finally so no failure path leaves an in-flight
    * write behind; `a`'s exception wins, else `b`'s, else `c`'s, and a
    * batch retry replays all three idempotently under the batch-id
    * fence.
    */
  private[streaming] def inParallel3[A](a: => A, b: => Unit, c: => Unit): A = {
    val fb = scala.concurrent.Future(b)(appendEc)
    val fc = scala.concurrent.Future(c)(appendEc)
    val ra =
      try a
      finally {
        scala.concurrent.Await.ready(
          fb, scala.concurrent.duration.Duration.Inf)
        scala.concurrent.Await.ready(
          fc, scala.concurrent.duration.Duration.Inf)
      }
    fb.value.get.get
    fc.value.get.get
    ra
  }

  private lazy val appendEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-registry-append")
        t.setDaemon(true)
        t
      }))

  /** One route's identity: screen-event label, catalog-name prefixes,
    * feature store subdir, and the feature column's name + SQL type.
    */
  final case class Kind(label: String, bandsPrefix: String,
                        featsPrefix: String, featsSubdir: String,
                        featName: String, featSqlType: String)

  def bandsDir(registryDir: String) = s"$registryDir/bands"
  def featsDir(kind: Kind, registryDir: String) =
    s"$registryDir/${kind.featsSubdir}"

  def bandsTableName(kind: Kind, registryDir: String): String =
    BucketedRegistry.tableName(kind.bandsPrefix, bandsDir(registryDir))
  def featsTableName(kind: Kind, registryDir: String): String =
    BucketedRegistry.tableName(kind.featsPrefix, featsDir(kind, registryDir))

  private def requireBandsTable(s: SparkSession, kind: Kind,
                                registryDir: String, buckets: Int): String =
    BucketedRegistry.requireTable(s, bandsDir(registryDir), buckets,
      kind.bandsPrefix, "band_key BIGINT, id BIGINT, batch_id BIGINT",
      "band_key")

  private def requireFeatsTable(s: SparkSession, kind: Kind,
                                registryDir: String, buckets: Int): String =
    BucketedRegistry.requireTable(s, featsDir(kind, registryDir), buckets,
      kind.featsPrefix,
      s"id BIGINT, ${kind.featName} ${kind.featSqlType}, batch_id BIGINT",
      "id")

  /** Fold both registries' append residue back toward ≤1 file per
    * bucket ([[StreamingBm25.compact]]'s staged-manifest protocol;
    * `minFileBytes` makes it size-tiered) and optionally refresh the
    * band registry's [[BucketScreen]] (incremental
    * [[BucketScreen.extendOrBuild]]) so the stream's maintained screen
    * revives/upgrades at its next batch. Run between batches (single
    * maintenance writer).
    */
  def compact(spark: SparkSession, kind: Kind, registryDir: String,
              buckets: Int, minFileBytes: Long, rebuildScreen: Boolean,
              screenFpp: Double, tierFanout: Int = 0): Unit = {
    val bt = requireBandsTable(spark, kind, registryDir, buckets)
    val dt = requireFeatsTable(spark, kind, registryDir, buckets)
    // the two registries are independent tables under independent
    // leases (per-dir) with per-table staging names: the feats compact
    // runs concurrently with the bands compact + screen refresh
    inParallel(
      {
        StreamingBm25.compact(spark, bt, bandsDir(registryDir),
          bucketCol = "band_key", numBuckets = buckets,
          minFileBytes = minFileBytes, tierFanout = tierFanout)
        if (rebuildScreen)
          BucketScreen.extendOrBuild(spark, bt, bandsDir(registryDir),
            buckets, screenFpp, keyCol = "band_key")
      },
      StreamingBm25.compact(spark, dt, featsDir(kind, registryDir),
        bucketCol = "id", numBuckets = buckets, minFileBytes = minFileBytes,
        tierFanout = tierFanout))
  }

  /** ZERO-DIAL maintenance window: both registries compact under the
    * [[MaintenancePolicy]]-derived size-tier floor and fanout, and the
    * band registry's screen extends or fully rebuilds per the derived
    * delta-fraction trigger — the caller chooses NOTHING (a mis-chosen
    * floor silently degrades to O(registry) windows; a forgotten full
    * build lets delta blooms grow unbounded). Returns the band-side
    * plan, whose `rebucketTo` (if set) the operator should apply via
    * [[rebucket]] at the next stream restart — rebucketing is a
    * stop-the-world rewrite, deliberately not fired behind a live
    * stream. No-op (None) until the registry exists.
    */
  def maintain(spark: SparkSession, kind: Kind, registryDir: String,
               bloomBudgetBytes: Long =
                 MaintenancePolicy.MaxBloomBytesPerBucket):
      Option[MaintenancePolicy.TablePlan] = {
    val bDir = bandsDir(registryDir)
    val fs = new org.apache.hadoop.fs.Path(bDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(bDir))) return None
    // buckets come from the on-disk contract, not a caller dial
    val buckets = BucketedRegistry.readBucketsMarker(fs, bDir).getOrElse(
      return None) // mid-first-append crash: next batch stamps it
    val bt = requireBandsTable(spark, kind, registryDir, buckets)
    // both tables' windows derive and apply their own plans from
    // independent on-disk stats (per-dir leases, per-table staging):
    // the feats window runs concurrently with the bands window + its
    // screen refresh
    val plan = inParallel(
      MaintenancePolicy.maintainTable(spark, bt, bDir, buckets,
        bucketCol = "band_key", withScreen = true,
        bloomBudgetBytes = bloomBudgetBytes),
      if (fs.exists(
          new org.apache.hadoop.fs.Path(featsDir(kind, registryDir)))) {
        val dt = requireFeatsTable(spark, kind, registryDir, buckets)
        MaintenancePolicy.maintainTable(spark, dt,
          featsDir(kind, registryDir), buckets, bucketCol = "id",
          withScreen = false, bloomBudgetBytes = bloomBudgetBytes)
        ()
      })
    Some(plan)
  }

  /** Rewrite BOTH registries at `newBuckets` buckets — the lifecycle
    * op for a registry that outlived its initial sizing (probe and
    * compaction parallelism are per bucket). Staged-manifest protocol
    * per table ([[BucketedRegistry.rebucket]]); refuses while a stream
    * registered in this JVM still runs; re-registers the catalog
    * tables at the new count and (optionally) rebuilds the band
    * screen, which the rebucket necessarily staled (its per-bucket
    * blooms were keyed by the old bucket count).
    */
  def rebucket(spark: SparkSession, kind: Kind, registryDir: String,
               newBuckets: Int, rebuildScreen: Boolean = false,
               screenFpp: Double = 1e-6): Unit = {
    BucketedRegistry.requireNoActiveStream(bandsDir(registryDir))
    BucketedRegistry.rebucket(spark, bandsDir(registryDir),
      kind.bandsPrefix, "band_key", newBuckets)
    BucketedRegistry.rebucket(spark, featsDir(kind, registryDir),
      kind.featsPrefix, "id", newBuckets)
    val fs = new org.apache.hadoop.fs.Path(registryDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(bandsDir(registryDir)))) {
      val bt = requireBandsTable(spark, kind, registryDir, newBuckets)
      requireFeatsTable(spark, kind, registryDir, newBuckets)
      if (rebuildScreen)
        BucketScreen.build(spark, bt, bandsDir(registryDir), newBuckets,
          screenFpp, keyCol = "band_key")
    }
  }

  /** Start the self-dedup stream. `featurize` turns the raw batch
    * (already projected to an `id` column plus the route's payload)
    * into `(id, <featName>, bands ARRAY<BIGINT>)`; `verify(a, b)`
    * is the exact similarity expression over two feature columns
    * (its ≥ `minSim` verdict decides duplication). `write` receives
    * each batch's `(id, dup_of, similarity-as-named-by-simName)` —
    * every input row, with nulls for admitted rows.
    */
  def run(prepared: DataFrame, kind: Kind, registryDir: String,
          checkpointDir: Option[String], buckets: Int,
          featurize: DataFrame => DataFrame,
          verify: (Column, Column) => Column, minSim: Double,
          simName: String, screenCapacity: Long, screenFpp: Double,
          registerDups: Boolean,
          geometry: Map[String, String] = Map.empty,
          geometryDerived: Boolean = false)
         (write: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = prepared.writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    val bDir = bandsDir(registryDir)
    val dDir = featsDir(kind, registryDir)
    val feat = kind.featName
    val maintained = new MaintainedScreen(bDir, buckets,
      screenCapacity, screenFpp, kind.label)
    var validated = false
    var geomOk = false
    val query = writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      MaintainedScreen.raiseInPushdown(s)
      val bPath = new org.apache.hadoop.fs.Path(bDir)
      val fs = bPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val bTbl = bandsTableName(kind, registryDir)
      val dTbl = featsTableName(kind, registryDir)
      val exists = fs.exists(bPath)
      // geometry contract BEFORE the first probe: a resume against a
      // registry banded under different geometry must fail loudly here
      // — its band keys would never collide with registered ones, so
      // every later batch would silently admit duplicates. A
      // PRE-EXISTING dir with no marker is a legacy registry: stamping
      // it is a trusted (loudly logged) act, and refused outright when
      // this stream's geometry was DERIVED from defaults rather than
      // caller-pinned — the legacy stream's geometry may differ, and a
      // wrong stamp locks the hole in on the wrong side.
      if (exists && !geomOk && geometry.nonEmpty) {
        BucketedRegistry.requireGeometry(fs, registryDir, geometry,
          onMissing =
            if (geometryDerived) BucketedRegistry.MissingGeometry.Refuse
            else BucketedRegistry.MissingGeometry.StampTrusted)
        geomOk = true
      }
      if (exists && (!validated || !s.catalog.tableExists(bTbl) ||
          !s.catalog.tableExists(dTbl))) {
        requireBandsTable(s, kind, registryDir, buckets)
        requireFeatsTable(s, kind, registryDir, buckets)
        validated = true
      }
      if (exists) {
        // this batch must see the previous batch's append: refresh the
        // (micro-batch-session) catalog's cached file listings
        s.catalog.refreshTable(bTbl)
        s.catalog.refreshTable(dTbl)
      }
      // one pass over the batch computes everything reused below
      // (bands probe both sides, features for verification, both
      // appends, the screen extension) — pin it for the batch
      val base = featurize(batch)
        .select(col("id"), col(feat), col("bands"))
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
        val featsReg =
          if (exists) s.table(dTbl).where(col("batch_id") < batchId)
            .select("id", feat)
          else base.limit(0).select("id", feat)
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
        // everything from the candidate-id collect on runs under this
        // try so an exception anywhere (the collect, the join builds,
        // the write) unpersists crossCand before the batch retry —
        // the previous shape only covered it from `best` onward and
        // leaked the cached plan on an early failure
        try {
        // the feature fetch must not scan the registry either: a
        // broadcast join of few candidates against the feature table
        // still READS every row — an O(registry) term per dirty batch
        // the band screen cannot remove. Collect the candidate ids
        // (bounded by this batch's band collisions; a clean batch is a
        // statically-empty relation and costs nothing) and push
        // `id IN (…)` into the bucketed scan — bucket pruning + the
        // id-sorted files' row-group stats skip every uninvolved row.
        // Past the push limit the batch is substantially duplicate and
        // the full fetch is the cheaper plan (ScreenPushLimit).
        val candIds = crossCand.select(col("cand_id")).distinct()
          .limit(Spans.ScreenPushLimit + 1).collect().map(_.getLong(0))
        val featsFetch =
          if (candIds.isEmpty) featsReg.limit(0)
          else if (candIds.length > Spans.ScreenPushLimit) featsReg
          else featsReg.where(col("id").isin(candIds.toIndexedSeq: _*))
        val crossPairs = crossCand
          .join(featsFetch.select(col("id").as("cand_id"),
            col(feat).as("cand_feat")), Seq("cand_id"))
          .join(base.select(col("id"), col(feat)), Seq("id"))
        // within-batch candidates: earlier id in the SAME batch (the
        // registry only holds strictly earlier batches). Quadratic in
        // a batch's band COLLISIONS, by definition batch-bounded and
        // independent of registry size — a pathological batch of
        // thousands of identical docs pays it once; the derived
        // banding geometry keeps random collisions ∝ true near-dups,
        // so realistic batches stay ~linear

        val selfPairs = batchBands.as("a")
          .join(batchBands.as("b"),
            col("a.band_key") === col("b.band_key") &&
              col("b.id") < col("a.id"))
          .select(col("a.id").as("id"), col("b.id").as("cand_id")).distinct()
          .join(base.select(col("id").as("cand_id"),
            col(feat).as("cand_feat")), Seq("cand_id"))
          .join(base.select(col("id"), col(feat)), Seq("id"))
        val verified = crossPairs.unionByName(selfPairs)
          .select(col("id"), col("cand_id"),
            verify(col(feat), col("cand_feat")).as(simName))
          .where(col(simName) >= minSim)
        // keep-earliest verdict: the SMALLEST qualifying earlier id
        // (struct min orders by cand_id first), carrying ITS value
        val best = verified.groupBy("id")
          .agg(min(struct(col("cand_id"), col(simName))).as("m"))
          .select(col("id"), col("m.cand_id").as("dup_of"),
            col(s"m.$simName").as(simName))
          .persist() // batch-bounded; consumed by the output AND (in
                     // keep-first mode) the registration anti-join
        try {
          val out = base.select(col("id")).join(best, Seq("id"), "left")
            .select(col("id"), col("dup_of"), col(simName))
          // registration scope: everything (the oracle-exact default)
          // or admitted rows only (keep-first production — the
          // registry grows with unique content, not stream volume)
          val registrants =
            if (registerDups) base
            else base.join(best.select(col("id")), Seq("id"), "left_anti")
          val registrantBands = registrants
            .select(col("id"), explode(col("bands")).as("band_key"))
          // the sink write, the registry appends, and the screen
          // extension's collect job are independent given `base`/
          // `best` (both pinned): overlap all three. A batch that
          // fails in the sink after the appends landed replays under
          // the batch-id fence exactly like the documented
          // crash-after-append case — the replayed probe sees only
          // strictly earlier batches, so verdicts are unchanged. The
          // extension's filter MUTATION stays strictly after the
          // appends (extendApply below) — a key the screen covers but
          // the registry lost would be a false negative.
          var extBufs: java.util.List[Array[Long]] = null
          inParallel3(write(out), {
          // appends, marker-first per table (see clipStream's ordering
          // argument); both fenced under this batch's id for replays
          BucketedRegistry.writeBucketsMarkerIfAbsent(fs, bDir, buckets)
          BucketedRegistry.writeBucketsMarkerIfAbsent(fs, dDir, buckets)
          // stamp the geometry on the fresh registry (validate-only if
          // a marker already landed — idempotent under replays)
          if (geometry.nonEmpty && !geomOk) {
            BucketedRegistry.requireGeometry(fs, registryDir, geometry)
            geomOk = true
          }
          if (!validated || !s.catalog.tableExists(bTbl) ||
              !s.catalog.tableExists(dTbl)) {
            requireBandsTable(s, kind, registryDir, buckets)
            requireFeatsTable(s, kind, registryDir, buckets)
            validated = true
          }
          // repartition by the BUCKET ID first: one file per bucket per
          // batch instead of (partitions × buckets) — see clipStream's
          // append for the measured 32× litter consequence. The two
          // appends hit DIFFERENT tables from shared cached inputs, so
          // they run as concurrent jobs: the feats append's driver-side
          // analysis/commit overlaps the bands append's tasks (both
          // must land before the screen extends — a key the screen
          // covers but the registry lost would be a false negative).
          inParallel(
            registrantBands.withColumn("batch_id", lit(batchId))
              .repartition(buckets, pmod(hash(col("band_key")), lit(buckets)))
              .write.mode("append").format("parquet").option("path", bDir)
              .bucketBy(buckets, "band_key").sortBy("band_key")
              .saveAsTable(bTbl),
            registrants.select(col("id"), col(feat),
                lit(batchId).as("batch_id"))
              .repartition(buckets, pmod(hash(col("id")), lit(buckets)))
              .write.mode("append").format("parquet").option("path", dDir)
              .bucketBy(buckets, "id").sortBy("id")
              .saveAsTable(dTbl))
          }, {
            extBufs = maintained.extendCollect(
              registrantBands.select(col("band_key").as("h")).distinct())
          })
          maintained.extendApply(extBufs, batchId)
        } finally best.unpersist(blocking = false)
        } finally crossCand.unpersist(blocking = false)
      } finally base.unpersist(blocking = false)
      ()
    }.start()
    // single-writer guard: rebucket (a whole-table rewrite) refuses
    // while this query is active in the same JVM
    BucketedRegistry.registerStream(bandsDir(registryDir), query)
    BucketedRegistry.registerStream(featsDir(kind, registryDir), query)
    query
  }
}
