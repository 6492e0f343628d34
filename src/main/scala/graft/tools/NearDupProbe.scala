package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.{BucketScreen, BucketedRegistry, StreamingNearDup}

/** Per-batch cost of the streaming self near-dup route against band-
  * registry SIZE — the [[SelfDedupProbe]] question asked of the r14
  * route: once the registries hold N band postings, what does the
  * NEXT batch cost, clean vs dirty, with and without the maintained
  * screen? The scale claim under test: a clean batch under the
  * two-tier screen never scans the registry (folds to limit(0)); a
  * dirty batch pushes only its screen-positive band keys into the
  * bucketed bands scan (`band_key IN (…)`), paying ∝ collisions; the
  * unscreened route re-reads the full bands registry per batch and
  * must grow with N.
  *
  * Registries are PRE-BUILT at batch_id = -1 (visible to the stream's
  * `batch_id < 0` fence from its first checkpointed batch) with the
  * stream's own kernels (shingle → minhash → 8 bands), one file per
  * bucket, bucket screen built on top — the steady state a long-lived
  * stream's maintenance produces. Measured per batch through a REAL
  * checkpointed nearDupStream (the ~1-2 s micro-batch floor is in
  * every cell; flatness across N is the claim, not the absolute).
  * The unscreened leg runs on a byte-copy of the registry dir so the
  * two streams cannot fence each other's appends in.
  *
  * Usage: runMain graft.tools.NearDupProbe [bandRowsCsv] [outPath]
  * [buckets]
  *
  * The optional third arg overrides the bucket count (default 32) —
  * the boundary-regime lever: the policy's rebucket trigger and the
  * single-task bloom-build envelope are both ROWS-PER-BUCKET
  * quantities, so a 400M-row registry at 4 buckets exercises the
  * exact same per-task regime as 3.2B rows at 32 buckets, at a tenth
  * of the disk.
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,10000000,30000000")
      .split(",").map(_.trim.toLong).toSeq
    val outPath = args.lift(1)
    val bucketsArg = args.lift(2).map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // production parity with the stream's cloned-session raise
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val buckets = bucketsArg.getOrElse(32)
    val bandsPerDoc = Dedup.NumBands

    // doc i's text: 10 disjoint tokens — distinct shingle sets, no
    // cross-doc collisions except the planted dirty copy of doc 0
    def textOf(idCol: org.apache.spark.sql.Column) = concat_ws(" ",
      (0 until 10).map(k => concat(lit("d"), idCol, lit(s"w$k"))): _*)

    // past this size the unscreened control leg (full registry re-scan
    // per batch) and its byte-copy are omitted: the flat-vs-linear
    // contrast is established on the smaller legs (and r14/r15
    // artifacts to 300M); the BILLION-row legs exist to measure the
    // screened route's flatness and the one-task-per-bucket bloom
    // build's wall/memory envelope
    val UnscreenedMaxRows = 300000000L

    /** Bands + docs registries at batch_id = -1, one file per bucket,
      * bucket screen built over the bands. Returns (screen build
      * seconds, capacity per bucket, max bloom bytes per bucket) — the
      * single-task envelope that decides when per-bucket builds need
      * sub-bucket sharding.
      */
    def mkRegistry(nBands: Long, dir: String): (Double, Long, Long) = {
      val nDocs = nBands / bandsPerDoc
      val base = spark.range(nDocs).select(col("id"), textOf(col("id")).as("text"))
        .withColumn("sh", Dedup.shingleHashes(col("text"), 3))
        .withColumn("bands", graft.dedup.ShingleKernel.bandHash64(
          Dedup.minhashSignatureFromHashes(col("sh")), bandsPerDoc))
      val bDir = s"$dir/bands"; val dDir = s"$dir/docs"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(bDir))
      fs.mkdirs(new org.apache.hadoop.fs.Path(dDir))
      BucketedRegistry.writeBucketsMarkerIfAbsent(fs, bDir, buckets)
      BucketedRegistry.writeBucketsMarkerIfAbsent(fs, dDir, buckets)
      // the pre-built registry carries the full on-disk contract the
      // stream validates: the r16 legacy-registry guard refuses a
      // marker-less dir under derived-default geometry BY DESIGN, and
      // this builder knows its geometry exactly
      BucketedRegistry.requireGeometry(fs, dir, Map(
        "kind" -> "minhash-jaccard", "shingle_n" -> "3",
        "perms" -> Dedup.NumPerms.toString,
        "bands" -> bandsPerDoc.toString))
      val bTbl = StreamingNearDup.bandsTableName(dir)
      val dTbl = StreamingNearDup.docsTableName(dir)
      base.select(col("id"), explode(col("bands")).as("band_key"),
          lit(-1L).as("batch_id"))
        .select(col("band_key"), col("id"), col("batch_id"))
        .repartition(buckets, pmod(hash(col("band_key")), lit(buckets)))
        .write.mode("append").format("parquet").option("path", bDir)
        .bucketBy(buckets, "band_key").sortBy("band_key").saveAsTable(bTbl)
      base.select(col("id"), col("sh"), lit(-1L).as("batch_id"))
        .repartition(buckets, pmod(hash(col("id")), lit(buckets)))
        .write.mode("append").format("parquet").option("path", dDir)
        .bucketBy(buckets, "id").sortBy("id").saveAsTable(dTbl)
      val t0 = System.nanoTime()
      require(BucketScreen.build(spark, bTbl, bDir, buckets,
        keyCol = "band_key").contains(-1L), "screen build failed")
      val buildSecs = (System.nanoTime() - t0) / 1e9
      val fs2 = new org.apache.hadoop.fs.Path(bDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val perBucket = fs2.listStatus(
          new org.apache.hadoop.fs.Path(s"$bDir/_screen")).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("bloom-"))
        .map(_.getLen)
      // capacity the build sized each bucket's filter at (13/10 + 64
      // over rows/buckets — mirrors BucketScreen.build's sizing)
      val capacity = math.max(nBands / buckets * 13L / 10L + 64L, 1024L)
      (buildSecs, capacity, perBucket.maxOption.getOrElse(0L))
    }

    /** One stream, one batch at a time; returns seconds per batch. */
    def runBatches(dir: String, screenCapacity: Long,
                   batches: Seq[DataFrame]): Seq[Double] = {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val ckpt = graft.TempDirs.create("ndp-ckpt").toString
      var verdicts = 0L
      val q = StreamingNearDup.nearDupStream(
        ms.toDS().toDF("id", "text"), col("id"), col("text"), dir,
        Some(ckpt), buckets = buckets, minJaccard = 0.9,
        screenCapacity = screenCapacity) { out =>
        verdicts += out.count()
      }
      try batches.map { b =>
        val rows = b.as[(Long, String)].collect().toSeq
        val t0 = System.nanoTime()
        ms.addData(rows)
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      } finally q.stop()
    }

    // clean: 200 fresh docs (ids far past every registry id); dirty:
    // 199 fresh + 1 EXACT copy of registered doc 0's text (collides in
    // all 8 bands, verifies at jaccard 1.0 against the docs registry)
    def clean(tag: Long) = spark.range(200)
      .select((col("id") + 900000000L + tag * 1000).as("id"),
        textOf(col("id") + 900000000L + tag * 1000).as("text"))
    def dirty(tag: Long) = clean(tag).where(col("id") % 200 =!= 0)
      .unionByName(spark.range(1)
        .select((col("id") + 900000000L + tag * 1000).as("id"),
          textOf(lit(0L)).as("text")))

    // tail-rebuild cost: append this many DOCS' band rows after the
    // screen build, then time the incremental extend — the maintenance
    // cost a window pays to fold its new data into the bucket blooms
    val tailDocs = 50000L

    spark.range(100).count()
    val results = sizes.map { n =>
      val dir = graft.TempDirs.create(s"ndp-$n").toString + "/reg"
      val (buildSecs, capPerBucket, maxBloomBytes) = mkRegistry(n, dir)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      // bucket-bloom bytes on disk — the number that decides whether
      // per-bucket blooms carry billions of grams (scales ~3.6 B/row
      // at 1e-6 fpp split across the bucket files, never the driver)
      val screenBytes = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$dir/bands/_screen")).toSeq
        .filter(_.isFile).map(_.getLen).sum
      // what the r16 derived policy would say about this layout —
      // rows/bucket vs the single-task bloom budget
      val rec = graft.streaming.MaintenancePolicy.plan(
        graft.streaming.MaintenancePolicy.TableStats(buckets, n, buckets,
          0L, 1L, None, 0L)).rebucketTo
      val unscreened =
        if (n > UnscreenedMaxRows) Seq(-1.0, -1.0)
        else {
          // byte-copy for the unscreened leg (separate checkpoint =>
          // its batch ids restart at 0; sharing a dir would fence wrong)
          val dirNs = graft.TempDirs.create(s"ndp-ns-$n").toString + "/reg"
          org.apache.hadoop.fs.FileUtil.copy(fs,
            new org.apache.hadoop.fs.Path(dir), fs,
            new org.apache.hadoop.fs.Path(dirNs), false, conf)
          runBatches(dirNs, screenCapacity = 0L, Seq(clean(1), clean(2)))
        }
      val screened = runBatches(dir, screenCapacity = 4000000L,
        Seq(clean(1), clean(2), dirty(3), dirty(4)))
      // tail rebuild: register a 50k-doc tail after the covered batch,
      // then extend the bucket blooms incrementally — cost must track
      // the TAIL (bloom bytes + tail scan), not the registry
      val bTbl = StreamingNearDup.bandsTableName(dir)
      spark.range(tailDocs)
        .select((col("id") + 950000000L).as("id"),
          textOf(col("id") + 950000000L).as("text"))
        .withColumn("bands", graft.dedup.ShingleKernel.bandHash64(
          Dedup.minhashSignatureFromHashes(
            Dedup.shingleHashes(col("text"), 3)), bandsPerDoc))
        .select(explode(col("bands")).as("band_key"), col("id"),
          lit(99L).as("batch_id"))
        .repartition(buckets, pmod(hash(col("band_key")), lit(buckets)))
        .write.mode("append").format("parquet").option("path", s"$dir/bands")
        .bucketBy(buckets, "band_key").sortBy("band_key").saveAsTable(bTbl)
      val tExt = System.nanoTime()
      val ext = BucketScreen.extendOrBuild(spark, bTbl, s"$dir/bands",
        buckets, keyCol = "band_key")
      val extendSecs = (System.nanoTime() - tExt) / 1e9
      require(ext.contains(99L), s"extend must cover the tail, got $ext")
      println(f"bands=$n%,d  clean_screen=${math.min(screened(0), screened(1))}%.2fs  " +
        f"dirty_screen=${math.min(screened(2), screened(3))}%.2fs  " +
        f"clean_noscreen=${math.min(unscreened(0), unscreened(1))}%.2fs  " +
        f"screen_mb=${screenBytes / 1e6}%.1f  tail_extend=$extendSecs%.2fs  " +
        f"screen_build=$buildSecs%.1fs  max_bloom_mb=${maxBloomBytes / 1e6}%.1f  " +
        s"policy_rebucket=${rec.getOrElse(0)}")
      (n, math.min(screened(0), screened(1)),
        math.min(screened(2), screened(3)),
        math.min(unscreened(0), unscreened(1)), screenBytes, extendSecs,
        buildSecs, capPerBucket, maxBloomBytes, rec.getOrElse(0))
    }
    val json =
      s"""{"registry_band_rows":[${results.map(_._1).mkString(",")}],""" +
      s""""clean_screen":[${results.map(r => f"${r._2}%.3f").mkString(",")}],""" +
      s""""dirty_screen":[${results.map(r => f"${r._3}%.3f").mkString(",")}],""" +
      s""""clean_noscreen":[${results.map(r => f"${r._4}%.3f").mkString(",")}],""" +
      s""""screen_bytes":[${results.map(_._5).mkString(",")}],""" +
      s""""tail_docs":$tailDocs,""" +
      s""""tail_extend_secs":[${results.map(r => f"${r._6}%.3f").mkString(",")}],""" +
      s""""screen_build_secs":[${results.map(r => f"${r._7}%.3f").mkString(",")}],""" +
      s""""capacity_per_bucket":[${results.map(_._8).mkString(",")}],""" +
      s""""max_bloom_bytes_per_bucket":[${results.map(_._9).mkString(",")}],""" +
      s""""buckets":$buckets,""" +
      s""""policy_rebucket_to":[${results.map(_._10).mkString(",")}]}"""
    println(json)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
