package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Multi-tier (LSM) compaction: `tierFanout = K` must bound the
  * per-bucket file count over the stream's LIFETIME at O(K·log_K W)
  * windows while the single-floor form grows O(W) — and neither form
  * may lose, duplicate, or reorder a row (batch-id fencing rows ride
  * along verbatim). This drives W windows of (append litter → tiered
  * compact) against two identical tables, one per mode, and compares
  * trajectories and content.
  */
class LsmCompactSpec extends AnyFunSuite with SparkSpec {

  private val buckets = 2

  private def tableFor(dir: String): String =
    BucketedRegistry.tableName("graft_lsm_spec", dir)

  private def payload(tag: String) = concat_ws("-", lit(tag),
    col("id").cast("string"), xxhash64(col("id"), lit(tag)).cast("string"))

  private def mkTable(dir: String): String = {
    val tbl = tableFor(dir)
    spark.range(4000)
      .select(xxhash64(payload("base")).as("h"), payload("base").as("gram"),
        lit(0L).as("batch_id"))
      .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
      .write.format("parquet").option("path", dir)
      .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)
    tbl
  }

  private def append(dir: String, tbl: String, tag: String, n: Int,
                     batchId: Long): Unit =
    spark.range(n)
      .select(xxhash64(payload(tag)).as("h"), payload(tag).as("gram"),
        lit(batchId).as("batch_id"))
      .repartition(buckets, pmod(hash(col("h")), lit(buckets)))
      .write.mode("append").format("parquet").option("path", dir)
      .bucketBy(buckets, "h").sortBy("h").saveAsTable(tbl)

  private def filesPerBucket(dir: String): Map[Int, Int] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val re = "_(\\d{5})\\.".r
    fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .flatMap(st => re.findFirstMatchIn(st.getPath.getName)
        .map(_.group(1).toInt))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  private def contentDigest(tbl: String): (Long, Long, Long) = {
    spark.catalog.refreshTable(tbl)
    val r = spark.table(tbl)
      .select(xxhash64(col("h"), col("gram"), col("batch_id")).as("x"),
        col("batch_id"))
      .agg(count(lit(1)), expr("bit_xor(x)"), max(col("batch_id")))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("tierFanout bounds files/bucket over windows; single-floor grows linearly; content identical") {
    val windows = 12
    val fanout = 2
    val tiered = graft.TempDirs.create("lsm-tiered").toString + "/t"
    val flat = graft.TempDirs.create("lsm-flat").toString + "/t"
    val tTbl = mkTable(tiered)
    val fTbl = mkTable(flat)
    // calibrate the litter floor off a real append's file size, like
    // production does off its own batch residue
    append(tiered, tTbl, "cal", 800, 1L)
    val fs = new Path(tiered)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.listStatus(new Path(tiered)).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getLen)
    val litter = base.min // an append file; base files are far larger
    val floor = litter * 3 / 2 // single append < floor <= merged window
    append(flat, fTbl, "cal", 800, 1L)
    var tieredMax = 0
    var batch = 2L
    (1 to windows).foreach { w =>
      Seq("x", "y").foreach { t =>
        append(tiered, tTbl, s"$t$w", 800, batch)
        append(flat, fTbl, s"$t$w", 800, batch)
        batch += 1
      }
      StreamingBm25.compact(spark, tTbl, tiered, bucketCol = "h",
        numBuckets = buckets, minFileBytes = floor, tierFanout = fanout)
      StreamingBm25.compact(spark, fTbl, flat, bucketCol = "h",
        numBuckets = buckets, minFileBytes = floor)
      tieredMax = math.max(tieredMax, filesPerBucket(tiered).values.max)
    }
    val tieredFinal = filesPerBucket(tiered).values.max
    val flatFinal = filesPerBucket(flat).values.max
    // single-floor: one new >=floor file per bucket per window, forever
    assert(flatFinal >= windows,
      s"single-floor should hold ~1 base + $windows window files: $flatFinal")
    // multi-tier: binary-counter shape at K=2 — O(log2 W) + transient
    assert(tieredMax <= 7,
      s"tiered files/bucket must stay O(K log_K W): max=$tieredMax")
    assert(tieredFinal * 2 < flatFinal,
      s"tiered=$tieredFinal vs flat=$flatFinal after $windows windows")
    // no row lost, duplicated, or re-batched by either mode
    val td = contentDigest(tTbl)
    val fd = contentDigest(fTbl)
    assert(td == fd, s"tiered digest $td != flat digest $fd")
    assert(td._1 == 4000L + 800L * (1 + 2 * windows), s"row count: $td")
    assert(td._3 == batch - 1, s"max batch_id must survive compaction: $td")
  }
}
