package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** On-disk contract of a self-growing bucketed registry table — the
  * shared machinery under [[StreamingSelfDedup]]'s gram registry and
  * [[StreamingNearDup]]'s band/doc registries: a parquet dir that IS a
  * hash-bucketed catalog table (re-registered per process), plus a
  * `_BUCKETS` marker making the bucket count part of the on-disk
  * contract — a fresh-session resume that re-registered the table
  * with a DIFFERENT count would bucket-prune probes against the wrong
  * buckets (silent wrong answers) before the next append even got the
  * chance to fail on the spec mismatch.
  */
private[graft] object BucketedRegistry {

  /** Catalog name for the registry at `dir` — derived from the dir so
    * concurrent streams in one session cannot collide. XXH64 of the
    * path bytes: a 32-bit hash over many long-lived registry dirs has
    * a real birthday-collision chance, and a collision would silently
    * cross-contaminate two streams' registries. [[requireTable]]
    * additionally verifies the registered table's LOCATION, so even a
    * 64-bit collision (or a foreign table squatting on the name)
    * fails loudly instead of probing someone else's rows.
    */
  def tableName(prefix: String, dir: String): String = {
    val bytes = dir.getBytes("UTF-8")
    s"${prefix}_${java.lang.Long.toHexString(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L))}"
  }

  private def bucketsMarker(dir: String) = new Path(dir, "_BUCKETS")

  def readBucketsMarker(fs: FileSystem, dir: String): Option[Int] = {
    val p = bucketsMarker(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  /** Temp-then-rename: a crash between create and write must not
    * leave a zero-byte marker that wedges every later open on
    * `"".toInt` — after the rename the marker is complete or absent.
    */
  def writeBucketsMarkerIfAbsent(fs: FileSystem, dir: String,
                                 buckets: Int): Unit = {
    val p = bucketsMarker(dir)
    if (!fs.exists(p)) {
      val tmp = new Path(dir, "._BUCKETS.tmp")
      val out = fs.create(tmp, true)
      try out.write(buckets.toString.getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, false) // lost a (single-writer-violating) race
        ()
      }
    }
  }

  // ---- single-writer guard (JVM-local, best-effort) -------------------

  /** Live streams by registry table dir — maintenance ops that rewrite
    * the table wholesale ([[rebucket]]) refuse while the stream that
    * owns the dir is still active. JVM-local by design: it protects
    * the common operational mistake (maintenance driver and stream in
    * one process); the cross-process case stays on the documented
    * single-maintenance-writer contract, same as compaction.
    */
  private val activeStreams = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.WeakReference[
      org.apache.spark.sql.streaming.StreamingQuery]]()

  private[streaming] def registerStream(
      dir: String,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    activeStreams.put(dir, new java.lang.ref.WeakReference(q))

  def requireNoActiveStream(dir: String): Unit = {
    val ref = activeStreams.get(dir)
    if (ref != null) {
      val q = ref.get
      require(q == null || !q.isActive,
        s"a stream over the registry at $dir is still active; stop it " +
          "before rebucketing (single-writer contract)")
    }
  }

  // ---- re-bucketing (maintenance-window lifecycle op) -----------------

  private def rebucketManifest(dir: String) =
    new Path(dir, "__rebucket/manifest")

  /** Roll a crashed [[rebucket]] forward. The manifest only lands
    * AFTER the full re-bucketed file set staged, so its presence means
    * every new file exists (still staged or already moved): finish the
    * moves, delete the listed old files, rewrite the `_BUCKETS`
    * marker to the new count, drop the stale `_screen`, then drop the
    * manifest — idempotent at every crash point. No manifest = the
    * table dir and marker were never touched.
    */
  private def recoverRebucket(fs: FileSystem, dir: String): Unit = {
    val manifest = rebucketManifest(dir)
    if (!fs.exists(manifest)) return
    val in = fs.open(manifest)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    val root = new Path(dir)
    val stage = new Path(dir, "__rebucket/stage")
    val newBuckets = lines.collectFirst {
      case l if l.startsWith("B ") => l.substring(2).trim.toInt
    }.getOrElse(throw new IllegalStateException(
      s"rebucket manifest at $manifest has no B line"))
    lines.foreach { line =>
      val (tag, name) = (line.charAt(0), line.substring(2))
      if (tag == 'A') {
        val src = new Path(stage, name)
        if (fs.exists(src) && !fs.rename(src, new Path(root, name)))
          throw new java.io.IOException(
            s"rebucket roll-forward: rename $src failed")
      } else if (tag == 'D') fs.delete(new Path(root, name), false)
    }
    // marker rewrite: the manifest guards the delete→rename window (a
    // marker-less dir with a live manifest refuses to open)
    fs.delete(bucketsMarker(dir), false)
    writeBucketsMarkerIfAbsent(fs, dir, newBuckets)
    // per-bucket screen blooms are keyed by pmod(hash, OLD buckets) —
    // stale the moment the layout changes; rebuild via maintenance
    fs.delete(new Path(dir, "_screen"), true)
    fs.delete(new Path(dir, "__rebucket"), true)
  }

  /** Rewrite the registry table at `dir` with `newBuckets` buckets —
    * the lifecycle op for a registry that outlived its initial sizing
    * (probe/compaction parallelism is per bucket, and [[requireTable]]
    * refuses a mismatched open by design, so without this a registry
    * created at 8 buckets could never reach 32 except by hand outside
    * the staged-manifest protocol).
    *
    * Protocol (same staged-manifest family as
    * [[StreamingBm25.compact]], rolled FORWARD): stage the complete
    * re-bucketed file set under `__rebucket/stage`, land a manifest
    * (`B <newBuckets>` + `A <new>`/`D <old>` lines, temp+rename), move
    * the new files in, delete the old, rewrite the `_BUCKETS` marker,
    * drop the stale `_screen`, drop the manifest. A crash at any point
    * either left the table untouched (no manifest) or is finished by
    * the roll-forward that runs at the head of every [[rebucket]] —
    * and [[requireTable]] REFUSES to open a dir with a live rebucket
    * manifest, so no probe ever sees the mixed state.
    *
    * Refuses while a stream registered in this JVM is still active;
    * cross-process callers hold the single-maintenance-writer
    * contract. The catalog table is dropped (its bucket spec is
    * stale); the next [[requireTable]] re-registers it at the new
    * count. Cost is one full read + bucketed write of the table — by
    * construction NOT ∝ new data; run it rarely, at maintenance scale
    * events.
    */
  def rebucket(spark: SparkSession, dir: String, prefix: String,
               bucketCol: String, newBuckets: Int): Unit = {
    require(newBuckets > 0, s"newBuckets must be positive, got $newBuckets")
    requireNoActiveStream(dir)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // cross-process single-maintenance-writer (the guard above is
    // JVM-local only); explicit try/finally for the early returns
    val lease = MaintenanceLease.acquire(fs, dir)
    try {
    recoverRebucket(fs, dir)
    if (!fs.exists(root)) return // nothing registered yet — first
                                 // batch creates at the caller's count
    val current = readBucketsMarker(fs, dir).getOrElse(
      throw new IllegalStateException(
        s"registry at $dir has no _BUCKETS marker; open it once (which " +
          "stamps the marker after the part-file cross-check) before " +
          "rebucketing"))
    val tbl = tableName(prefix, dir)
    if (current == newBuckets) {
      // a crash between a prior rebucket's roll-forward and its DROPs
      // leaves the OLD bucket spec in a persistent catalog; the re-run
      // lands here (marker already restamped) — repair the catalog too,
      // or requireTable's location-only check would accept an N-bucket
      // layout through a stale-count table spec. Dropping a valid spec
      // on a no-op rebucket is harmless: the next open re-registers it.
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_rebucket_stage")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      return
    }
    val old = fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName)
    if (old.isEmpty) {
      // marker-only dir (a first append crashed before any data file):
      // nothing to rewrite — restamp the marker at the new count
      fs.delete(bucketsMarker(dir), false)
      writeBucketsMarkerIfAbsent(fs, dir, newBuckets)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      return
    }
    val stage = new Path(dir, "__rebucket/stage")
    fs.delete(stage, true)
    val stageTable = s"${tbl}_rebucket_stage"
    spark.sql(s"DROP TABLE IF EXISTS $stageTable")
    // raw parquet read (underscore-prefixed protocol files are hidden
    // from the lister) — the catalog table's bucket spec is the OLD
    // count and is about to be dropped anyway
    spark.read.parquet(dir)
      .repartition(newBuckets, pmod(hash(col(bucketCol)), lit(newBuckets)))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .option("path", stage.toString)
      .bucketBy(newBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(stageTable)
    // the O(table) stage write is the long pole: refresh the lease so
    // a rebucket slower than the TTL is never taken over mid-flight
    MaintenanceLease.heartbeat(fs, lease)
    val staged = fs.listStatus(stage).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("part-"))
    val mTmp = new Path(dir, "__rebucket/.manifest.tmp")
    val out = fs.create(mTmp, true)
    try out.write((Seq(s"B $newBuckets") ++ staged.map("A " + _) ++
      old.map("D " + _)).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // commit point: abort BEFORE the manifest rename if the lease was
    // lost (staged files are unreferenced litter until the manifest)
    MaintenanceLease.validate(fs, lease)
    if (!fs.rename(mTmp, rebucketManifest(dir)))
      throw new java.io.IOException(
        s"rebucket manifest rename failed at $dir")
    spark.sql(s"DROP TABLE IF EXISTS $stageTable")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    recoverRebucket(fs, dir) // the roll-forward IS the commit path
    } finally MaintenanceLease.release(fs, lease)
  }

  /** What to do when a `_GEOMETRY` marker is ABSENT on an existing
    * registry dir — the one moment the contract cannot be checked and
    * must be established. The distinctions matter because a WRONG stamp
    * closes the hole on the wrong side forever (every later open
    * validates against the bad values).
    */
  sealed trait MissingGeometry
  object MissingGeometry {
    /** The registry was just created by this very stream: the caller's
      * geometry IS the registry's geometry by construction — stamp
      * silently.
      */
    case object StampFresh extends MissingGeometry
    /** A pre-marker (legacy) registry opened with CALLER-EXPLICIT
      * geometry: stamp it, but log the stamped values LOUDLY — this
      * one trusted open locks them in, and only the operator can audit
      * them against the stream that originally wrote the registry.
      */
    case object StampTrusted extends MissingGeometry
    /** A pre-marker registry opened with DERIVED-DEFAULT geometry:
      * refuse. The derivation may not match what the legacy stream ran
      * (e.g. the embedding route's pre-r15 8x16 default vs the derived
      * 30x15 at minCosine 0.9), and trusted-stamping the derived values
      * would both silently miss every prior registration AND lock the
      * wrong geometry in. The caller must resume with explicit values.
      */
    case object Refuse extends MissingGeometry
  }

  /** Validate-or-stamp a `_GEOMETRY` properties marker at the registry
    * ROOT (the parent of a route's bands/feature table dirs): sorted
    * `key=value` lines, temp-then-rename like `_BUCKETS`. The banding
    * geometry (shingle n / perms / bands for MinHash; dim / bands /
    * bits / seed for sign-hyperplanes) is part of the on-disk contract
    * exactly like the bucket count — band keys from a DIFFERENT
    * geometry never collide with registered ones, so a resumed stream
    * with mismatched geometry would silently emit no duplicates
    * against prior registrations instead of failing loudly. An absent
    * marker on an existing dir follows `onMissing` (see
    * [[MissingGeometry]]); an absent DIR is always a no-op (nothing
    * exists to contract against yet).
    */
  def requireGeometry(fs: FileSystem, dir: String,
                      props: Map[String, String],
                      onMissing: MissingGeometry =
                        MissingGeometry.StampFresh): Unit = {
    val p = new Path(dir, "_GEOMETRY")
    val render = props.toSeq.sorted
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val txt =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
      val found = txt.linesIterator.filter(_.nonEmpty).map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      require(found == props,
        s"registry at $dir was written with banding geometry $found; " +
          s"refusing to open it with $props (band keys from a different " +
          "geometry never collide — duplicates would be silently missed)")
    } else if (fs.exists(new Path(dir))) {
      onMissing match {
        case MissingGeometry.Refuse =>
          throw new IllegalStateException(
            s"registry at $dir predates the _GEOMETRY marker and this " +
              "open uses DERIVED-default banding geometry " +
              s"(${props.toSeq.sorted.map { case (k, v) => s"$k=$v" }
                .mkString(", ")}); the legacy stream's geometry may " +
              "differ, and a wrong trusted stamp would silently miss " +
              "every prior registration — resume with the explicit " +
              "geometry the registry was created under to stamp it")
        case note =>
          val tmp = new Path(dir, "._GEOMETRY.tmp")
          val out = fs.create(tmp, true)
          try out.write(render.getBytes("UTF-8")) finally out.close()
          if (!fs.rename(tmp, p)) { fs.delete(tmp, false); () }
          else if (note == MissingGeometry.StampTrusted)
            Console.err.println(
              s"[graft] TRUSTED-STAMPED _GEOMETRY at $dir: " +
                props.toSeq.sorted.map { case (k, v) => s"$k=$v" }
                  .mkString(", ") +
                " — this pre-marker registry had no geometry contract; " +
                "this one open locked these values in. AUDIT them " +
                "against the stream that created the registry (a wrong " +
                "stamp silently misses every prior registration).")
      }
    }
  }

  /** Ensure the bucketed registry table for `dir` is registered in
    * `spark`'s (shared) catalog and safe to use: validates the
    * `_BUCKETS` marker against `buckets` and — when the table already
    * exists — that its LOCATION is actually `dir` (name-hash
    * collision / foreign table guard). Idempotent; the
    * checkpoint-resume path in a fresh session runs this before its
    * first probe, or the batch would silently probe an empty registry.
    *
    * @param columnsDdl e.g. `"h BIGINT, gram STRING, batch_id BIGINT"`
    *                   — must include `bucketCol`
    */
  def requireTable(spark: SparkSession, dir: String, buckets: Int,
                   prefix: String, columnsDdl: String,
                   bucketCol: String): String = {
    val tbl = tableName(prefix, dir)
    val regPath = new Path(dir)
    val fs = regPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a live rebucket manifest means a [[rebucket]] crashed mid-swap:
    // the dir holds a mix of old- and new-bucketed files and the
    // marker may lag — refuse until the roll-forward finishes (re-run
    // rebucket), or every probe would bucket-prune against a layout
    // that is half one count and half the other
    if (fs.exists(rebucketManifest(dir)))
      throw new IllegalStateException(
        s"registry at $dir has an unfinished rebucket (manifest " +
          "present); re-run rebucket to roll it forward before opening")
    readBucketsMarker(fs, dir) match {
      case Some(m) =>
        require(m == buckets,
          s"registry at $dir was written with $m buckets; " +
            s"refusing to open it as $buckets (probes would " +
            s"bucket-prune against the wrong buckets)")
      case None if fs.exists(regPath) =>
        // marker-less dir (pre-marker registry, or a crash before the
        // marker landed): this open necessarily TRUSTS the caller's
        // count — but cross-check it against the bucket ids the
        // existing part-file NAMES carry (the `_0000N` suffix Spark's
        // bucketed writer assigns) before stamping, or a wrong count
        // on this one trusted open is locked in and every later probe
        // silently under-answers against the wrong buckets
        val bucketIdRe = "_(\\d{5})\\.".r
        val maxSeen = fs.listStatus(regPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .flatMap(st => bucketIdRe.findFirstMatchIn(st.getPath.getName)
            .map(_.group(1).toInt))
          .maxOption
        maxSeen.foreach(m => require(m < buckets,
          s"registry at $dir has part-files up to bucket id $m; " +
            s"refusing to stamp it as $buckets buckets"))
        writeBucketsMarkerIfAbsent(fs, dir, buckets)
        if (maxSeen.isDefined)
          Console.err.println(
            s"[graft] TRUSTED-STAMPED _BUCKETS=$buckets at $dir — this " +
              "pre-marker registry had no bucket-count contract; the " +
              "part-file names were cross-checked (max bucket id " +
              s"${maxSeen.get}) but cannot prove the count. AUDIT it " +
              "against the stream that created the registry.")
      case None => ()
    }
    if (spark.catalog.tableExists(tbl)) {
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location
      val want = fs.makeQualified(regPath).toUri
      if (fs.makeQualified(new Path(loc)).toUri != want)
        throw new IllegalStateException(
          s"catalog table $tbl points at $loc, not $dir — " +
            "table-name collision or foreign table; refusing to probe it")
    } else if (fs.exists(regPath))
      spark.sql(s"CREATE TABLE $tbl ($columnsDdl) " +
        s"USING parquet CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) " +
        s"INTO $buckets BUCKETS LOCATION '$dir'")
    tbl
  }
}
