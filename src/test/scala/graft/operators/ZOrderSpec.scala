package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // reference interleave, bit by bit
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the bitwise reference on a value sweep") {
    val vals = Seq(0L, 1L, 2L, 3L, 7L, 100L, 65535L, 65536L,
      123456789L, 2147483647L)
    val rows = for (x <- vals; y <- vals) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y), s"($x, $y)")
    }
  }

  test("out-of-range inputs yield null, never a wrapped ordering") {
    val out = Seq((-1L, 5L), (5L, -1L), (2147483648L, 0L), (0L, 2147483648L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("z-sorted layout bounds BOTH dimensions per file; linear sort does not") {
    // 64x64 grid of points
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def fileRanges(sorted: org.apache.spark.sql.DataFrame): Array[(Long, Long)] = {
      val dir = Files.createTempDirectory("graft-z").toString
      sorted.coalesce(1).write.mode("overwrite")
        .option("maxRecordsPerFile", 256).parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    }
    val zRanges = fileRanges(pts
      .withColumn("z", ZOrder.zValue(col("x"), col("y"))).orderBy("z"))
    val linRanges = fileRanges(pts.orderBy("x", "y"))
    assert(zRanges.length >= 8)
    // every z-file's bounding box is a small square (256 points -> 16x16)
    assert(zRanges.forall { case (xr, yr) => xr <= 16 && yr <= 16 },
      s"z ranges: ${zRanges.mkString(", ")}")
    // the linear layout leaves y unbounded per file (full 0..63 spread)
    assert(linRanges.exists(_._2 >= 60))
  }
}
