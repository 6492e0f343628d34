package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures registry compaction cost against BASE size — the r13
  * verdict's LSM question: does per-invocation maintenance cost track
  * the table's lifetime (full rewrite) or the new data (size-tiered)?
  *
  * For each base size N: build a compacted registry of N rows, append
  * M ≪ N rows as per-batch litter (16 small appends), then time
  * (a) SIZE-TIERED compact (minFileBytes floor: merges only the
  * litter) and (b) FULL compact (rewrites everything), on separate
  * copies. Tiered time should be ~flat across N; full time grows with
  * N. Also times the bucket-screen rebuild at each N for the screen's
  * maintenance-cost line. Prints one JSON line.
  *
  * Usage: runMain graft.tools.CompactProbe [rowsCsv] [outPath]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,10000000,30000000")
      .split(",").map(_.trim.toLong).toSeq
    val outPath = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val buckets = 32
    val appendRows = 50000L
    val appendBatches = 16

    def gram(prefix: String) = concat_ws(" ", (0 until 8).map(k =>
      concat(lit(prefix), (col("id") + k).cast("string"))): _*)

    // base registry: built bucketed, then FULL-compacted once so the
    // base tier is exactly one big file per bucket (the steady state a
    // long-running stream's maintenance produces)
    def mkRegistry(n: Long, dir: String): Unit = {
      val tbl = graft.streaming.StreamingSelfDedup.registryTableName(dir)
      spark.range(n).select(lit(0L).as("batch_id"), gram("r").as("gram"))
        .select(xxhash64(col("gram")).as("h"), col("gram"), col("batch_id"))
        .write.format("parquet").option("path", dir)
        .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
      graft.streaming.StreamingSelfDedup.compactRegistry(spark, dir, buckets)
      // per-batch append litter: 16 batches, ONE file per bucket each —
      // the bucket-id repartition the production append performs (an
      // un-repartitioned bucketed append writes partitions × buckets
      // files; the first version of this probe did exactly that and
      // measured the 32×-litter world: tiered 30s vs full 13s at 1M)
      val per = appendRows / appendBatches
      (1 to appendBatches).foreach { b =>
        spark.range(per)
          .select(xxhash64(gram(s"a$b")).as("h"), gram(s"a$b").as("gram"),
            lit(b.toLong).as("batch_id"))
          .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
          .write.mode("append").format("parquet").option("path", dir)
          .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
      }
    }

    spark.range(100).count()
    val results = sizes.map { n =>
      val tieredDir = graft.TempDirs.create(s"cprobe-t-$n").toString + "/reg"
      val fullDir = graft.TempDirs.create(s"cprobe-f-$n").toString + "/reg"
      mkRegistry(n, tieredDir)
      mkRegistry(n, fullDir)
      // floor: litter files are ~per-batch sized; the base files are
      // ~N/buckets rows. Anything under 1/4 of a base file is litter.
      val fs = new org.apache.hadoop.fs.Path(tieredDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val baseLen = fs.listStatus(new org.apache.hadoop.fs.Path(tieredDir))
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(_.getLen).max
      val t0 = System.nanoTime()
      graft.streaming.StreamingSelfDedup.compactRegistry(
        spark, tieredDir, buckets, minFileBytes = baseLen / 4)
      val tiered = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.streaming.StreamingSelfDedup.compactRegistry(spark, fullDir, buckets)
      val full = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      graft.streaming.BucketScreen.build(spark,
        graft.streaming.StreamingSelfDedup.registryTableName(fullDir),
        fullDir, buckets)
      val screen = (System.nanoTime() - t2) / 1e9
      // the r14 incremental form: append more per-batch litter on top
      // of the built screen, then EXTEND it — the tail scan rides the
      // batch_id>covered row-group stats and the bloom I/O is the
      // screen's own bytes, so this should stay ~flat across base N
      // while screen_build grows with it
      val tbl = graft.streaming.StreamingSelfDedup.registryTableName(fullDir)
      val perB = appendRows / appendBatches
      (appendBatches + 1 to appendBatches + 4).foreach { b =>
        spark.range(perB)
          .select(xxhash64(gram(s"x$b")).as("h"), gram(s"x$b").as("gram"),
            lit(b.toLong).as("batch_id"))
          .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
          .write.mode("append").format("parquet").option("path", fullDir)
          .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
      }
      val t3 = System.nanoTime()
      val ext = graft.streaming.BucketScreen.extendOrBuild(
        spark, tbl, fullDir, buckets)
      val screenExt = (System.nanoTime() - t3) / 1e9
      require(ext.contains((appendBatches + 4).toLong),
        s"extend must advance covered to ${appendBatches + 4}, got $ext")
      println(f"base=$n%,d append=$appendRows%,d  tiered=$tiered%.2fs  " +
        f"full=$full%.2fs  screen_build=$screen%.2fs  " +
        f"screen_extend=$screenExt%.2fs")
      (n, tiered, full, screen, screenExt)
    }
    // ---- lifetime leg (r15): files/bucket over W maintenance windows.
    // The single-floor form leaves one >=floor file per bucket per
    // window FOREVER (probe cost grows with window count); the multi-
    // tier rule (tierFanout=K) merges K same-tier files into the next
    // tier, bounding files/bucket at O(K log_K W) while each window
    // still reads only litter + due tiers (amortized cost ~ new data,
    // each byte rewritten O(log_K W) times over the lifetime).
    val windows = 30
    val fanout = 4
    val windowBatches = 4 // appends per window, each one file/bucket
    val perWindowRows = appendRows // same litter volume as the legs above
    def filesPerBucketMax(dir: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val re = "_(\\d{5})\\.".r
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .flatMap(st => re.findFirstMatchIn(st.getPath.getName)
          .map(_.group(1).toInt))
        .groupBy(identity).map(_._2.length).maxOption.getOrElse(0)
    }
    def windowsLeg(baseRows: Long, tierFanout: Int):
        (Seq[Int], Seq[Double]) = {
      val dir = graft.TempDirs.create(
        s"cprobe-w-$tierFanout").toString + "/reg"
      val tbl = graft.streaming.StreamingSelfDedup.registryTableName(dir)
      spark.range(baseRows)
        .select(xxhash64(gram("w")).as("h"), gram("w").as("gram"),
          lit(0L).as("batch_id"))
        .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
        .write.format("parquet").option("path", dir)
        .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      var floor = 0L
      var batch = 1L
      val trajectory = scala.collection.mutable.ArrayBuffer[Int]()
      val secs = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to windows).foreach { w =>
        val per = perWindowRows / windowBatches
        (1 to windowBatches).foreach { _ =>
          spark.range(per)
            .select(xxhash64(gram(s"w$batch")).as("h"),
              gram(s"w$batch").as("gram"), lit(batch).as("batch_id"))
            .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
            .write.mode("append").format("parquet").option("path", dir)
            .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
          batch += 1
        }
        if (floor == 0L) {
          // calibrate off the first window's real litter: a single
          // append file sits under 2x its own size, the merged window
          // (windowBatches of them) lands above it — every window's
          // merge output escapes the litter floor into tier space
          val sizes = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
            .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
            .map(_.getLen)
          floor = sizes.min * 2
        }
        val t = System.nanoTime()
        graft.streaming.StreamingSelfDedup.compactRegistry(
          spark, dir, buckets, minFileBytes = floor,
          tierFanout = tierFanout)
        secs += (System.nanoTime() - t) / 1e9
        trajectory += filesPerBucketMax(dir)
      }
      (trajectory.toSeq, secs.toSeq)
    }
    // ---- ZERO-DIAL policy leg (r16): the same 30-window lifetime, but
    // every window is one `maintainRegistry(spark, dir)` call — floor,
    // fanout, and the screen extend-vs-full-build decision all derived
    // by MaintenancePolicy from on-disk stats, nothing caller-chosen.
    // Claims measured: files/bucket stays bounded (the derived fanout-4
    // multi-tier merge), per-window cost stays ~flat, and FULL screen
    // builds fire only when the delta tier crosses the derived 25%
    // boundary (geometric cadence: as the base grows, builds space out)
    // while every other window extends at delta-sized cost.
    def policyWindowsLeg(baseRows: Long):
        (Seq[Int], Seq[Double], Seq[Boolean]) = {
      val dir = graft.TempDirs.create("cprobe-p").toString + "/reg"
      val tbl = graft.streaming.StreamingSelfDedup.registryTableName(dir)
      spark.range(baseRows)
        .select(xxhash64(gram("p")).as("h"), gram("p").as("gram"),
          lit(0L).as("batch_id"))
        .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
        .write.format("parquet").option("path", dir)
        .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the production stream stamps this on first append; the probe
      // builds the registry directly, so it stamps the contract itself
      graft.streaming.BucketedRegistry
        .writeBucketsMarkerIfAbsent(fs, dir, buckets)
      var batch = 1L
      val traj = scala.collection.mutable.ArrayBuffer[Int]()
      val secs = scala.collection.mutable.ArrayBuffer[Double]()
      val fullBuilds = scala.collection.mutable.ArrayBuffer[Boolean]()
      (1 to windows).foreach { _ =>
        val per = perWindowRows / windowBatches
        (1 to windowBatches).foreach { _ =>
          spark.range(per)
            .select(xxhash64(gram(s"p$batch")).as("h"),
              gram(s"p$batch").as("gram"), lit(batch).as("batch_id"))
            .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
            .write.mode("append").format("parquet").option("path", dir)
            .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
          batch += 1
        }
        val t = System.nanoTime()
        val plan = graft.streaming.StreamingSelfDedup
          .maintainRegistry(spark, dir)
        secs += (System.nanoTime() - t) / 1e9
        traj += filesPerBucketMax(dir)
        fullBuilds += plan.exists(_.fullScreenBuild)
      }
      (traj.toSeq, secs.toSeq, fullBuilds.toSeq)
    }

    val wBase = 2000000L
    val (tierTraj, tierSecs) = windowsLeg(wBase, fanout)
    val (flatTraj, flatSecs) = windowsLeg(wBase, 0)
    val (polTraj, polSecs, polBuilds) = policyWindowsLeg(wBase)
    println(f"policy windows=$windows base=$wBase%,d  " +
      f"files/bucket max=${polTraj.max} final=${polTraj.last}  " +
      f"win secs avg=${polSecs.sum / windows}%.2f  " +
      s"full_screen_builds at windows " +
      s"${polBuilds.zipWithIndex.collect { case (true, i) => i + 1 }.mkString(",")}")
    println(f"windows=$windows fanout=$fanout base=$wBase%,d  " +
      f"tiered files/bucket max=${tierTraj.max} final=${tierTraj.last}  " +
      f"single-floor final=${flatTraj.last}  " +
      f"tiered win secs avg=${tierSecs.sum / windows}%.2f  " +
      f"single-floor avg=${flatSecs.sum / windows}%.2f")
    val json =
      s"""{"base_rows":[${results.map(_._1).mkString(",")}],""" +
      s""""append_rows":$appendRows,""" +
      s""""tiered_compact":[${results.map(r => f"${r._2}%.3f").mkString(",")}],""" +
      s""""full_compact":[${results.map(r => f"${r._3}%.3f").mkString(",")}],""" +
      s""""screen_build":[${results.map(r => f"${r._4}%.3f").mkString(",")}],""" +
      s""""screen_extend":[${results.map(r => f"${r._5}%.3f").mkString(",")}],""" +
      s""""windows":{"count":$windows,"fanout":$fanout,""" +
      s""""base_rows":$wBase,"window_rows":$perWindowRows,""" +
      s""""tiered_files_per_bucket":[${tierTraj.mkString(",")}],""" +
      s""""singlefloor_files_per_bucket":[${flatTraj.mkString(",")}],""" +
      s""""tiered_window_secs":[${tierSecs.map(s => f"$s%.3f").mkString(",")}],""" +
      s""""singlefloor_window_secs":[${flatSecs.map(s => f"$s%.3f").mkString(",")}]},""" +
      s""""policy_windows":{"count":$windows,"base_rows":$wBase,""" +
      s""""window_rows":$perWindowRows,""" +
      s""""files_per_bucket":[${polTraj.mkString(",")}],""" +
      s""""window_secs":[${polSecs.map(s => f"$s%.3f").mkString(",")}],""" +
      s""""full_screen_build_windows":[${polBuilds.zipWithIndex
        .collect { case (true, i) => i + 1 }.mkString(",")}]}}"""
    println(json)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
