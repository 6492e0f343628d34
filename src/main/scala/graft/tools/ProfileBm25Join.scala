package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextAnalysis

/** Dev profiler for the bm25Join pipeline stages. */
object ProfileBm25Join {
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
    val toks = split(lower(trim(col("text"))), "\\s+")
    time("scan")(docs.count())
    time("explode")(docs.select(col("doc_id"), explode(toks).as("token")).count())
    time("postings repart")(docs.repartition(32).select(col("doc_id").as("id"),
        size(toks).cast("long").as("dl"), explode(toks).as("token"))
      .groupBy("id", "dl", "token").agg(count(lit(1)).as("tf")).count())
    val queries = Seq((1L, Seq("hash", "join")), (2L, Seq("vector", "scan")),
      (3L, Seq("merge", "sort", "window"))).toDF("query_id", "terms")
    time("full bm25Join")(TextAnalysis.bm25Join(docs, col("doc_id"),
      col("text"), queries, k = 5).count())
    time("full again")(TextAnalysis.bm25Join(docs, col("doc_id"),
      col("text"), queries, k = 5).count())
    spark.stop()
  }
}
