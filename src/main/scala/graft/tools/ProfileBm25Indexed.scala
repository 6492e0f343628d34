package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextAnalysis

/** Dev profiler for the build+serve indexed BM25 path. */
object ProfileBm25Indexed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    spark.range(100).count()
    docs.count()
    val queries = Seq((1L, Seq("hash", "join")), (2L, Seq("vector", "scan")),
      (3L, Seq("merge", "sort", "window"))).toDF("query_id", "terms")
    for (round <- 1 to 3) {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"${graft.TempDirs.token}bm25-prof$round").toString
      time(s"build index r$round") {
        TextAnalysis.buildBm25Index(docs, col("doc_id"), col("text"),
          "graft_bm25_prof", tmp, numBuckets = 8)
        1L
      }
      time(s"serve r$round")(TextAnalysis.bm25JoinIndexed(spark,
        "graft_bm25_prof", queries, k = 5).count())
    }
    spark.stop()
  }
}
