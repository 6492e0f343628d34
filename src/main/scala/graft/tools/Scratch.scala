package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextAnalysis

// throwaway profiling main — not part of the shipped surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMER $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm
    Tables.documents(spark, dir).count()

    import spark.implicits._
    (1 to 2).foreach { round =>
      val tmp = java.nio.file.Files.createTempDirectory("scratch-bm25").toString
      t(s"build-$round") {
        TextAnalysis.buildBm25Index(Tables.documents(spark, dir),
          col("doc_id"), col("text"), "scratch_bm25", tmp, numBuckets = 8)
      }
      val queries = Seq(
        (1L, Seq("hash", "join")),
        (2L, Seq("vector", "scan")),
        (3L, Seq("merge", "sort", "window"))).toDF("query_id", "terms")
      t(s"serve-$round") {
        TextAnalysis.bm25JoinIndexed(spark, "scratch_bm25", queries, k = 5)
          .orderBy("query_id", "rank").collect()
      }
      spark.sql("DROP TABLE IF EXISTS scratch_bm25")
      spark.sql("DROP TABLE IF EXISTS scratch_bm25_stats")
    }
    spark.stop()
  }
}
