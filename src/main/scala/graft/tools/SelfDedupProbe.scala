package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Spans

/** Measures the streaming self-dedup clip's per-batch cost against
  * registry size — the r12 verdict's scale question: does a CLEAN
  * batch (no registry hits) still pay for the ever-growing registry?
  *
  * For each registry size it times one micro-batch step (the two
  * actions a real batch runs: emit + new-gram materialization) three
  * ways: unscreened, bloom-screened (the maintained screen
  * [[graft.streaming.StreamingSelfDedup.clipStream]] holds), and a
  * DIRTY screened batch for context (a hit pays the exact join by
  * design). Prints one JSON line:
  * {"registry_rows":[...],"clean_noscreen":[s...],"clean_screen":[s..],
  *  "dirty_screen":[s...]}
  *
  * Usage: runMain graft.tools.SelfDedupProbe [rowsCsv] [outPath]
  */
object SelfDedupProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,10000000,30000000")
      .split(",").map(_.trim.toLong).toSeq
    val outPath = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // production parity: clipStream raises this on its stream's
      // cloned session so a dirty batch's pushed `h IN (…)` set
      // reaches the parquet reader (row-group/page stats on the
      // h-sorted files) instead of degrading to a useless min/max
      // range at the default threshold of 10. 512 = the stack-safe
      // bound (see MaintainedScreen.raiseInPushdown / InPushProbe)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val buckets = 32
    // a "registry gram" is 8 synthetic tokens; doc grams below use a
    // disjoint token namespace for the clean batch and this one for
    // the dirty batch, so hit/miss is exact, not probabilistic
    def regGram = concat_ws(" ", (0 until 8).map(k =>
      concat(lit("r"), (col("id") + k).cast("string"))): _*)

    def mkRegistry(n: Long, dir: String): String = {
      val tbl = s"selfdedup_probe_reg_$n"
      spark.range(n).select(lit(0L).as("batch_id"), regGram.as("gram"))
        .select(xxhash64(col("gram")).as("h"), col("gram"), col("batch_id"))
        .write.format("parquet").option("path", dir)
        .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
      tbl
    }

    // one batch: 200 docs x 200 tokens (~40k seeds). NOT checkpointed
    // — matches the production shape (foreachBatch hands a plain
    // DataFrame), and a pre-checkpointed input's attribute ids collide
    // with the step's own seed checkpoint inside applyIntervals
    def batch(prefix: String): DataFrame =
      spark.range(200).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 200).map(k =>
          concat(lit(prefix), (col("id") * 1000 + k).cast("string"))): _*)
          .as("text"))

    val debug = sys.env.contains("SDPROBE_DEBUG")
    def stepSeconds(b: DataFrame, registry: DataFrame,
                    screen: Option[graft.dedup.SeedScreen]): Double = {
      val t0 = System.nanoTime()
      val (clipped, newGrams, release) = Spans.clipSpansPrefixStepScreened(
        b, col("doc_id"), col("text"), registry, 8, screen)
      val t1 = System.nanoTime()
      clipped.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      newGrams.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      release()
      if (debug) println(f"    construct=${(t1 - t0) / 1e9}%.2f " +
        f"clipped=${(t2 - t1) / 1e9}%.2f newgrams=${(t3 - t2) / 1e9}%.2f")
      (System.nanoTime() - t0) / 1e9
    }

    spark.range(100).count() // JIT/codegen warm
    val results = sizes.map { n =>
      val dir = graft.TempDirs.create(s"sdprobe-$n").toString + "/reg"
      val tbl = mkRegistry(n, dir)
      val registry = spark.table(tbl).where(col("batch_id") < 1L)
        .select("h", "gram")
      // the maintained bloom, built once on (re)start — NOT part of
      // the per-batch cost being measured. fpp 1e-6: the skip is
      // all-or-nothing per batch, so expected FPs per ~40k-seed batch
      // must sit well under 1 (clipStream's default). Built through
      // the shared builder — raw stat.bloomFilter silently clamps to
      // maxNumBits and saturates
      val bloom = graft.streaming.StreamingSelfDedup.bloomOver(
        registry, math.max(n, 1000L), 1e-6).get
      println(f"  bloom bits=${bloom.bitSize()}%,d expectedFpp=${bloom.expectedFpp()}%.2e")
      val screen = Some(graft.dedup.SeedScreen.fromDriverProbe(
        bloom.mightContainLong))
      // the beyond-driver-memory tier: per-bucket blooms beside the
      // registry, probed on executors; tail empty (fresh build) —
      // measures the SAME skip property with NO driver-held filter
      graft.streaming.BucketScreen.build(spark, tbl, dir, buckets)
      val bucketScreen = Some(graft.streaming.BucketScreen.probe(
        dir, buckets, probeDeltas = false, _ => false))
      // dirty batch: 200 docs whose first 8 tokens ARE registry grams
      val dirty = spark.range(200).select(col("id").as("doc_id"),
        concat_ws(" ", regGram +: (8 until 200).map(k =>
          concat(lit("d"), (col("id") * 1000 + k).cast("string"))): _*)
          .as("text"))
      val clean = batch("c")
      // floor: the registry-independent batch cost (empty registry,
      // no screen) — separates ambient drift from registry tracking
      val floor = (1 to 2).map(_ =>
        stepSeconds(clean, registry.limit(0), None)).min
      val noScreen = (1 to 2).map(_ =>
        stepSeconds(clean, registry, None)).min
      val screened = (1 to 2).map(_ =>
        stepSeconds(clean, registry, screen)).min
      val dirtyScreened = (1 to 2).map(_ =>
        stepSeconds(dirty, registry, screen)).min
      val cleanBucket = (1 to 2).map(_ =>
        stepSeconds(clean, registry, bucketScreen)).min
      val dirtyBucket = (1 to 2).map(_ =>
        stepSeconds(dirty, registry, bucketScreen)).min
      println(f"registry=$n%,d  floor=$floor%.2fs  clean_noscreen=$noScreen%.2fs  " +
        f"clean_screen=$screened%.2fs  dirty_screen=$dirtyScreened%.2fs  " +
        f"clean_bucket_screen=$cleanBucket%.2fs  dirty_bucket_screen=$dirtyBucket%.2fs")
      (n, floor, noScreen, screened, dirtyScreened, cleanBucket, dirtyBucket)
    }
    val json =
      s"""{"registry_rows":[${results.map(_._1).mkString(",")}],""" +
      s""""floor":[${results.map(r => f"${r._2}%.3f").mkString(",")}],""" +
      s""""clean_noscreen":[${results.map(r => f"${r._3}%.3f").mkString(",")}],""" +
      s""""clean_screen":[${results.map(r => f"${r._4}%.3f").mkString(",")}],""" +
      s""""dirty_screen":[${results.map(r => f"${r._5}%.3f").mkString(",")}],""" +
      s""""clean_bucket_screen":[${results.map(r => f"${r._6}%.3f").mkString(",")}],""" +
      s""""dirty_bucket_screen":[${results.map(r => f"${r._7}%.3f").mkString(",")}]}"""
    println(json)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
