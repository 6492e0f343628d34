package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-shard export layout — the sink end of a data pipeline.
  *
  * A pre-training loader consumes the corpus as a flat list of shard
  * files and streams each shard sequentially; what matters at 100 TB
  * is (a) shards of bounded, roughly-equal size (loader parallelism =
  * shard count; one 2 TB straggler file serializes the epoch tail),
  * (b) a deterministic global document order baked into the layout
  * (reshuffling 100 TB per epoch is not an option — the mix order is
  * decided once, at export), and (c) no driver-side choke point in the
  * writer. The reference has no batch export at all (its sink is a
  * per-request Milvus insert, /root/reference/extract_and_embed.py:121);
  * this is north-star extension surface.
  */
object Layout {

  /** Write `df` as `numShards` range-partitioned parquet shards laid
    * out in global `order` (pass a sha256 mix key for a deterministic
    * shuffle, or a curriculum score for ordered training). Each output
    * task writes one contiguous slice of the global order, rows sorted
    * within it, and `maxRecordsPerFile` caps file size so a skewed
    * range boundary degrades into extra files, never a straggler.
    *
    * Entirely executor-side: one range exchange, then parallel writes
    * — nothing but boundary sampling ever touches the driver.
    */
  def writeShards(df: DataFrame, path: String, numShards: Int,
                  maxRecordsPerFile: Long, order: Column*): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    require(maxRecordsPerFile > 0,
      s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    df.repartitionByRange(numShards, order: _*)
      .sortWithinPartitions(order: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Shard manifest for the written layout: one row per file with its
    * row count — what a loader uses to plan an epoch (and the export
    * job's audit trail). Derived from the files themselves, so it is
    * correct even after `maxRecordsPerFile` splits a range partition.
    */
  def manifest(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"))

  /** Small-file compaction: rewrite a parquet directory as
    * `ceil(totalBytes / targetFileBytes)` files. The small-files
    * problem is endemic to incremental pipelines (every streaming
    * micro-batch and every over-parallel write leaves file-per-task
    * litter; a 100 TB table fragmented into KB-scale files is
    * listing-bound before a byte is read). `coalesce` keeps the
    * rewrite NARROW — no shuffle, each output task concatenates a set
    * of input files — so cost is one parallel read+write of the data.
    * Returns the output file count. Writes to a separate `dest`:
    * overwriting the directory being read is not a safe operation to
    * offer.
    */
  def compactTo(spark: org.apache.spark.sql.SparkSession, src: String,
                dest: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    require(src != dest, "dest must differ from src")
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Recursive walk: partitioned layouts nest data files under
    // key=value directories, and a non-recursive list would size them
    // at 0 bytes → everything coalesced into one task (ADVICE r4).
    // Data files are anything that isn't a _SUCCESS/.crc-style marker;
    // sizing must not depend on a ".parquet" suffix convention.
    var totalBytes = 0L
    var dataFiles = 0
    val it = fs.listFiles(srcPath, true)
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        totalBytes += s.getLen
        dataFiles += 1
      }
    }
    require(dataFiles > 0, s"no data files found under $src — refusing " +
      "to compact an empty or marker-only directory")
    val n = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue).toInt
    spark.read.parquet(src).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(dest)
    n
  }

  /** Partition-preserving small-file compaction for directory-
    * partitioned layouts — the streamed IVF assignment's shape: every
    * micro-batch appends one file per `cluster_id=N/` directory, so a
    * long-running stream grows per-partition file counts without bound
    * (the directory-partitioned sibling of the bucketed-postings
    * problem [[graft.streaming.StreamingBm25.compact]] solves).
    * Rewrites to ≤1 file per partition directory (`maxRecordsPerFile`
    * splits oversized partitions into extra files, never a straggler),
    * preserving the partition columns so scan-level directory pruning
    * is untouched. Rows are grouped by the partition key so each
    * partition value lands whole in one task — one output file per
    * directory, regardless of how values hash across tasks. Writes to
    * a separate `dest` like [[compactTo]]; swap via rename or serve
    * the new root through a [[writeVersioned]]-style pointer.
    */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
                         src: String, dest: String,
                         partitionCols: Seq[String],
                         maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "at least one partition column required")
    require(src != dest, "dest must differ from src")
    val df = spark.read.parquet(src)
    val nParts = math.max(1L,
      df.select(partitionCols.map(col): _*).distinct().count()).toInt
    val base = df.repartition(nParts, partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0)
       base.option("maxRecordsPerFile", maxRecordsPerFile)
     else base)
      .partitionBy(partitionCols: _*).parquet(dest)
  }

  // ---- manifest-versioned corpus (atomic snapshot swap) --------------

  /** Transactional corpus versioning: each write lands in its own
    * `v=N` directory and becomes visible only when its commit marker
    * (`_commits/v-N`) exists — readers resolve "current" as the
    * highest committed version, so a writer killed mid-write leaves
    * the previous snapshot fully readable and the half-written `v=N`
    * directory invisible (it is reclaimed by the next claimant of that
    * version). This is the general-corpus counterpart of the
    * StreamingBm25 staged-commit protocol.
    *
    * Commit-point design note: the obvious `CURRENT` pointer file
    * updated by rename is NOT atomic on Hadoop filesystems —
    * `FileSystem.rename` to an existing destination returns false, and
    * delete-then-rename leaves a window with NO pointer. Marker
    * existence (created strictly after the data write completes) is
    * the atomic equivalent: a reader either sees the marker (data is
    * complete) or doesn't (previous version serves). Old snapshots
    * remain addressable for time travel until [[pruneVersions]].
    *
    * Multi-writer safety: version numbers are allocated through CLAIM
    * markers (`_claims/v-N`) created with a genuinely atomic per-scheme
    * primitive BEFORE any data is written. On `file:` that is java.nio
    * `CREATE_NEW` (O_CREAT|O_EXCL) — Hadoop's Local/ChecksumFileSystem
    * `createNewFile` is exists-then-create, a TOCTOU two same-JVM
    * threads lose routinely; on other schemes `fs.create(path,
    * overwrite = false)` (atomic on HDFS). Each claim carries the
    * writer's UUID, re-read after creation, immediately before
    * publication, AND once more after the commit-marker create
    * (retracting the marker if the claim was swept mid-commit).
    *
    * Data never lands in `v=N` directly: each writer stages into its
    * OWN `_staging/v-N-<uuid>` directory and publishes with a single
    * `rename` into `v=N` (atomic on `file:` and HDFS) — two writers
    * that both believe they hold the claim on a store whose create is
    * not exclusive (S3A-style) therefore cannot interleave bytes
    * inside one data directory (the ADVICE r11 clobber: A's overwrite
    * landing after B's commit marker). After the rename the writer
    * reads back the `_WRITER` tag it staged: HDFS rename semantics
    * move the source INSIDE an existing destination directory, so a
    * lost rename race surfaces as a missing/foreign tag and the write
    * aborts before any marker exists. On a store with NEITHER atomic
    * exclusive create NOR atomic rename (S3A has copy+delete renames),
    * these checks narrow every race to detection windows but cannot
    * close them — multi-writer use there additionally requires an
    * external lock (single-writer remains safe); on `file:`/HDFS the
    * claim create is exclusive and the protocol is lock-free.
    *
    * The sweep cooperates from its side: claim revoked first, data
    * deleted only while no commit marker exists. Two concurrent
    * writers that both compute `next = N` race on the claim; exactly
    * one wins, the loser advances to N+1. A claimed-but-uncommitted
    * version from a crashed writer just leaves a skipped number (its
    * garbage is reclaimed by [[pruneVersions]]' age-gated sweep).
    */
  def writeVersioned(df: DataFrame, root: String): Long =
    writeVersionedWithHook(df, root, _ => ())

  /** [[writeVersioned]] with a test seam invoked after the data write
    * and before the claim re-verify + commit — lets specs interleave a
    * faster writer + prune deterministically at the vulnerable point.
    */
  private[sources] def writeVersionedWithHook(df: DataFrame, root: String,
                                              beforeCommit: Long => Unit): Long = {
    val spark = df.sparkSession
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val writerId = java.util.UUID.randomUUID().toString
    val candidate = claimVersion(fs, root, writerId)
    val dataDir = new org.apache.hadoop.fs.Path(root, s"v=$candidate")
    // stage into a writer-UNIQUE directory: even if a non-exclusive
    // store handed the same claim to two writers, their bytes cannot
    // interleave — publication below is a single rename
    val staging = new org.apache.hadoop.fs.Path(root,
      s"_staging/v-$candidate-$writerId")
    fs.delete(staging, true)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // tag the payload so the post-rename read-back can prove WHOSE
    // data sits at v=N (underscore files are invisible to parquet)
    val tag = new org.apache.hadoop.fs.Path(staging, "_WRITER")
    val tagOut = fs.create(tag, true)
    try tagOut.write(writerId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally tagOut.close()
    beforeCommit(candidate)
    val claim = new org.apache.hadoop.fs.Path(root, s"_claims/v-$candidate")
    // verify-before-publish: the claim must still exist and still carry
    // OUR id. Gone → a pruneVersions sweep took us for a crashed writer;
    // another id → a non-exclusive store lost us the race after the
    // first verify. Either way v=N must never receive our data.
    require(readMarker(fs, claim).contains(writerId),
      s"claim for v=$candidate under $root was lost before publish " +
        "(swept by pruneVersions or raced on a non-atomic store) — " +
        "aborting; the staged data was never visible")
    val commits = new org.apache.hadoop.fs.Path(root, "_commits")
    fs.mkdirs(commits)
    val marker = new org.apache.hadoop.fs.Path(commits, s"v-$candidate")
    // a marker here means another writer already PUBLISHED v=N (claim
    // protocol bypassed or lost on a non-exclusive store) — its data
    // dir is live and must not be touched
    require(!fs.exists(marker),
      s"commit marker for v=$candidate already exists — another writer " +
        "published this version; refusing to touch its snapshot")
    // we hold the claim and no commit exists: anything at v=N is
    // unclaimed crash garbage that was never visible
    if (fs.exists(dataDir)) fs.delete(dataDir, true)
    require(fs.rename(staging, dataDir),
      s"rename of staged data into v=$candidate failed — lost a " +
        "publication race; aborting without committing")
    // HDFS rename semantics move the source INSIDE an existing
    // destination dir — prove the rename landed AS v=N with OUR payload.
    // On failure, remove the nested-move residue first: our stage may
    // now sit INSIDE the other writer's live snapshot, where neither
    // the orphan sweep (commit marker present) nor the staging sweep
    // (dir no longer under _staging) could ever reclaim it
    if (!readMarker(fs,
      new org.apache.hadoop.fs.Path(dataDir, "_WRITER")).contains(writerId)) {
      fs.delete(new org.apache.hadoop.fs.Path(dataDir, staging.getName), true)
      require(false,
        s"v=$candidate does not hold this writer's payload after rename — " +
          "lost a publication race on a non-atomic store; aborting")
    }
    require(atomicCreate(fs, marker,
      writerId.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      s"commit marker for v=$candidate already exists — another writer " +
        "bypassed the claim protocol; refusing to overwrite its snapshot")
    // close the verify→marker window against a concurrent sweep: the
    // sweep revokes the claim BEFORE touching data, so if our claim is
    // still ours now that the marker exists, the sweep cannot delete
    // this version's data anymore (it skips data dirs with a commit
    // marker); if the claim is gone, the sweep may be mid-delete —
    // retract the marker and abort rather than publish truncated data
    if (!readMarker(fs, claim).contains(writerId)) {
      fs.delete(marker, false)
      require(false,
        s"claim for v=$candidate was swept during commit — marker " +
          "retracted, aborting without publishing")
    }
    candidate
  }

  /** Allocate the next version number via the claim protocol: pick a
    * candidate above every committed and claimed version, atomically
    * create `_claims/v-N` bearing `writerId`, and verify by read-back
    * that this writer's id is the one in the file. Loses advance to
    * the next number. Exposed for the claim-stress spec.
    */
  private[sources] def claimVersion(fs: org.apache.hadoop.fs.FileSystem,
                                    root: String, writerId: String): Long = {
    val claims = new org.apache.hadoop.fs.Path(root, "_claims")
    fs.mkdirs(claims)
    // next candidate: above every committed AND every claimed version
    // (a live concurrent writer holds a claim with no commit yet)
    var candidate =
      (listVersions(fs, new org.apache.hadoop.fs.Path(root, "_commits")) ++
        listVersions(fs, claims)).foldLeft(0L)(math.max) + 1
    var won = false
    var attempts = 0
    while (!won) {
      attempts += 1
      require(attempts <= 10000, s"could not claim a version under $root " +
        "after 10000 attempts — claim directory runaway")
      val claim = new org.apache.hadoop.fs.Path(claims, s"v-$candidate")
      val commit = new org.apache.hadoop.fs.Path(root, s"_commits/v-$candidate")
      val bytes = writerId.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (!fs.exists(commit) && atomicCreate(fs, claim, bytes) &&
        readMarker(fs, claim).contains(writerId))
        won = true
      else candidate += 1
    }
    candidate
  }

  /** Atomic create-with-content for a small marker file. `file:` goes
    * through java.nio `CREATE_NEW` (a single O_CREAT|O_EXCL syscall);
    * other schemes use `fs.create(path, overwrite = false)` (atomic on
    * HDFS; stores where it is not are covered by the caller's
    * read-back verify). Returns true iff THIS call created the file.
    */
  private def atomicCreate(fs: org.apache.hadoop.fs.FileSystem,
                           path: org.apache.hadoop.fs.Path,
                           content: Array[Byte]): Boolean =
    if (fs.getScheme == "file") {
      try {
        val p = java.nio.file.Paths.get(path.toUri.getPath)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, content,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.io.IOException => false }
    } else {
      val created =
        try Some(fs.create(path, false))
        catch { case _: java.io.IOException => None } // exists: not ours
      created match {
        case None => false
        case Some(out) =>
          // the file IS ours from here — a failed content write must
          // not leave an ownerless claim permanently blocking this
          // version number
          try { try out.write(content) finally out.close(); true }
          catch {
            case _: java.io.IOException =>
              try fs.delete(path, false)
              catch { case _: java.io.IOException => () }
              false
          }
      }
    }

  /** Content of a small marker file, None if absent/unreadable. */
  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
                         path: org.apache.hadoop.fs.Path): Option[String] =
    try {
      if (fs.getScheme == "file") {
        val p = java.nio.file.Paths.get(path.toUri.getPath)
        if (!java.nio.file.Files.exists(p)) None
        else Some(new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
      } else {
        if (!fs.exists(path)) None
        else {
          val in = fs.open(path)
          try {
            val buf = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
            Some(new String(buf.toByteArray,
              java.nio.charset.StandardCharsets.UTF_8))
          } finally in.close()
        }
      }
    } catch { case _: java.io.IOException => None }

  /** `v-N` version numbers named under a marker directory. */
  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v-") => n.stripPrefix("v-").toLong }

  /** Highest committed version, None for an empty/never-written root. */
  def currentVersion(spark: org.apache.spark.sql.SparkSession,
                     root: String): Option[Long] = {
    val versions = committedVersions(spark, root)
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** All committed versions, ascending (time-travel surface). */
  def committedVersions(spark: org.apache.spark.sql.SparkSession,
                        root: String): Seq[Long] = {
    val commits = new org.apache.hadoop.fs.Path(root, "_commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) Seq.empty
    else fs.listStatus(commits).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v-") => n.stripPrefix("v-").toLong }
      .sorted
  }

  /** Read a committed snapshot: the current one by default, or a
    * pinned `version` for time travel. Throws on an uncommitted or
    * pruned version — never serves half-written data.
    */
  def readVersion(spark: org.apache.spark.sql.SparkSession, root: String,
                  version: Long = -1L): DataFrame = {
    val committed = committedVersions(spark, root)
    require(committed.nonEmpty, s"no committed versions under $root")
    val v = if (version < 0) committed.max else version
    require(committed.contains(v),
      s"version $v is not committed under $root (committed: $committed)")
    spark.read.parquet(s"$root/v=$v")
  }

  /** Drop all but the newest `keepLast` committed snapshots (marker
    * first, then data — a crash between the two leaves an unreferenced
    * data dir, never a dangling marker).
    *
    * Crashed-writer claims are swept only when BOTH hold: the claimed
    * version is below the oldest RETAINED committed version (NOT
    * `committed.max`, which advances while a slow writer is still
    * mid-write — the r10 live-claim race), and the claim file is older
    * than `claimGraceMs` (a live writer's claim is recent). Even a
    * mis-sized grace cannot corrupt data: [[writeVersioned]] re-reads
    * its claim immediately before the commit marker and aborts loudly
    * if the sweep took it — a swept live write is a failed job, never
    * a committed truncated snapshot.
    *
    * Orphan reclamation (ADVICE r11): a `v=N` data dir with NEITHER a
    * claim NOR a commit marker can never become visible (readers
    * resolve through markers; writers publish only while holding the
    * claim) — it is the residue of a retracted commit or a swept
    * writer, and is deleted once older than `claimGraceMs`. Stale
    * `_staging/v-N-<uuid>` dirs are swept under the same age gate when
    * the claim that owned them is gone or held by someone else.
    */
  def pruneVersions(spark: org.apache.spark.sql.SparkSession, root: String,
                    keepLast: Int,
                    claimGraceMs: Long = 24L * 3600 * 1000): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the current version")
    require(claimGraceMs >= 0, "claimGraceMs must be non-negative")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = committedVersions(spark, root)
    val doomed = committed.dropRight(keepLast)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"_commits/v-$v"), false)
      fs.delete(new org.apache.hadoop.fs.Path(root, s"_claims/v-$v"), false)
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true)
    }
    val retained = committed.takeRight(keepLast)
    val now = System.currentTimeMillis()
    val claims = new org.apache.hadoop.fs.Path(root, "_claims")
    if (fs.exists(claims) && retained.nonEmpty) {
      val floor = retained.min
      fs.listStatus(claims).toSeq
        .filter(_.getPath.getName.startsWith("v-"))
        .foreach { s =>
          val v = s.getPath.getName.stripPrefix("v-").toLong
          if (v < floor && now - s.getModificationTime > claimGraceMs) {
            // order matters: revoke the CLAIM first, so a still-live
            // writer's verify-before-commit fails from this point on;
            // then delete the data only if no commit marker appeared —
            // a writer that slipped its marker in between re-verifies
            // its claim AFTER the marker create and retracts it, so
            // neither interleaving commits a deleted data dir (deleting
            // data first left the whole recursive delete as a window
            // where verify still passed)
            fs.delete(s.getPath, false)
            if (!fs.exists(new org.apache.hadoop.fs.Path(root, s"_commits/v-$v")))
              fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true)
          }
        }
    }
    // orphaned data dirs: no claim, no commit marker — unreachable by
    // any reader or writer (a retracted commit or a swept claimant's
    // residue), age-gated so a just-renamed dir whose marker is a
    // moment away is never eligible (its writer still holds the claim
    // anyway, which alone protects it here)
    val retainedSet = retained.toSet
    (if (fs.exists(rootPath)) fs.listStatus(rootPath).toSeq else Seq.empty)
      // numeric names only: the root is user-visible surface, and a
      // stray 'v=backup' dir must not crash the whole maintenance job
      .filter(s => s.isDirectory && s.getPath.getName.matches("v=\\d+"))
      .foreach { s =>
        val v = s.getPath.getName.stripPrefix("v=").toLong
        val hasClaim = fs.exists(new org.apache.hadoop.fs.Path(root, s"_claims/v-$v"))
        if (!retainedSet.contains(v) && !hasClaim &&
          !fs.exists(new org.apache.hadoop.fs.Path(root, s"_commits/v-$v")) &&
          now - s.getModificationTime > claimGraceMs)
          fs.delete(s.getPath, true)
      }
    // stale staging dirs: the claim that owned them is gone (writer
    // aborted/swept) or carries a different writer — never sweep a
    // live claimant's in-flight stage
    val stagingRoot = new org.apache.hadoop.fs.Path(root, "_staging")
    if (fs.exists(stagingRoot)) {
      val StagingName = """v-(\d+)-(.+)""".r
      fs.listStatus(stagingRoot).toSeq.foreach { s =>
        s.getPath.getName match {
          case StagingName(v, uuid)
            if now - s.getModificationTime > claimGraceMs &&
              !readMarker(fs,
                new org.apache.hadoop.fs.Path(root, s"_claims/v-$v"))
                .contains(uuid) =>
            fs.delete(s.getPath, true)
          case _ => ()
        }
      }
    }
    doomed
  }

  /** Parquet write with a BLOOM FILTER on the named columns — the
    * storage-side answer to point lookups on high-cardinality keys
    * (fingerprints, upsert ids, chunk hashes). Min/max row-group
    * stats cannot prune a hash-distributed key (every row group spans
    * nearly the full hash range), so without the bloom a single
    * `fingerprint = 'abc…'` probe scans EVERY row group of a 100 TB
    * table; with it, the reader's row-group filter drops non-matching
    * groups from the read list at footer time — IO proportional to
    * matches, not corpus. Pruning is proven by scan metrics in
    * BloomSkipSpec; result equality with/without the filter is gated
    * by the `s9_bloom_pointlookup` oracle row.
    *
    * `expectedNdv` sizes the filter (parquet-mr derives bits from it;
    * over-estimating costs footer bytes, under-estimating costs false
    * positives — i.e. lost pruning, never lost rows).
    */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     expectedNdv: Long = 1000000L,
                     rowGroupBytes: Long = 128L * 1024 * 1024,
                     extraOptions: Map[String, String] = Map.empty): Unit = {
    require(bloomCols.nonEmpty, "at least one bloom column required")
    require(expectedNdv > 0 && rowGroupBytes > 0,
      "expectedNdv and rowGroupBytes must be positive")
    val opts = Map("parquet.block.size" -> rowGroupBytes.toString) ++
      bloomCols.flatMap(c => Seq(
        s"parquet.bloom.filter.enabled#$c" -> "true",
        s"parquet.bloom.filter.expected.ndv#$c" -> expectedNdv.toString)) ++
      extraOptions
    df.write.mode(SaveMode.Overwrite).options(opts).parquet(path)
  }
}
