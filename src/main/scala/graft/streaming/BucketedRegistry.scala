package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

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
