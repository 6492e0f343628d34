package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Parquet bloom-filter data skipping, proven by scan metrics: on a
  * hash-distributed key column, min/max row-group stats cannot prune
  * (every row group spans nearly the full hash range), so an absent-
  * key point lookup reads every row group WITHOUT the bloom and ZERO
  * row groups WITH it. Dictionary encoding is disabled on the test
  * table so dictionary-filter pruning cannot mask the contrast
  * (production fingerprint columns overflow the dictionary threshold
  * anyway — that is exactly when the bloom earns its bytes).
  */
class BloomSkipSpec extends AnyFunSuite with SparkSpec {

  // an md5-shaped key INSIDE every row group's [min, max] hex range —
  // so min/max stats cannot prune it — but present in no row (it is
  // the hash of a string outside the fixture's key space)
  private val AbsentKey =
    java.security.MessageDigest.getInstance("MD5")
      .digest("absent-sentinel".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** 60k md5 keys in ONE file with ~256 KB row groups → many row
    * groups, each min/max-spanning the hash range.
    */
  private def writeTable(path: String, bloom: Boolean): Unit = {
    val rows = spark.range(60000)
      .select(col("id"), md5(col("id").cast("string")).as("fingerprint"))
      .coalesce(1)
    val noDict = Map("parquet.enable.dictionary" -> "false")
    if (bloom)
      Layout.writeWithBloom(rows, path, Seq("fingerprint"),
        expectedNdv = 60000L, rowGroupBytes = 256L * 1024,
        extraOptions = noDict)
    else
      rows.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("parquet.block.size", (256L * 1024).toString)
        .options(noDict).parquet(path)
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect() // finalize AQE so metrics are the real scan's
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.metrics("numOutputRows").value).sum
  }

  test("absent-key probe: bloom prunes every row group, stats prune none") {
    val dir = graft.TempDirs.create("bloomspec").toString
    writeTable(s"$dir/with", bloom = true)
    writeTable(s"$dir/without", bloom = false)
    val probeWith = scanRows(
      spark.read.parquet(s"$dir/with").where(col("fingerprint") === AbsentKey))
    val probeWithout = scanRows(
      spark.read.parquet(s"$dir/without").where(col("fingerprint") === AbsentKey))
    assert(probeWith == 0L,
      s"bloom-enabled scan still surfaced $probeWith rows — no row-group pruning")
    assert(probeWithout > 0L,
      "stats-only scan read zero rows: the fixture no longer isolates the bloom " +
        "(did dictionary pruning come back?)")
  }

  test("present keys: identical results with and without the filter") {
    val dir = graft.TempDirs.create("bloomspec-eq").toString
    writeTable(s"$dir/with", bloom = true)
    writeTable(s"$dir/without", bloom = false)
    // 5 planted keys spread across the file's row groups
    val keys = (0 until 5).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest((i * 12345).toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    def lookup(p: String) =
      spark.read.parquet(p)
        .where(col("fingerprint").isin(keys: _*))
        .orderBy("id").collect().map(_.toSeq).toSeq
    val a = lookup(s"$dir/with")
    val b = lookup(s"$dir/without")
    assert(a == b)
    assert(a.length == 5, s"expected the 5 planted keys, got ${a.length}")
  }
}
