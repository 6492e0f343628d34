package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.text.TextAnalysis
import graft.sources.Tables

/** Dev profiler for the exact-dedup pipeline stages. */
object ProfileExact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val content = Enrich.dedupContent(col("text"), col("doc_id"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    spark.range(100).count()
    time("scan only")(docs.count())
    time("fingerprint agg")(docs.select(
      TextAnalysis.fingerprint(col("text")).as("f"))
      .agg(count(col("f"))).collect().head.getLong(0))
    time("dedupContent fp agg")(docs.select(
      TextAnalysis.fingerprint(content).as("f"))
      .agg(count(col("f"))).collect().head.getLong(0))
    time("groupBy")(docs.select(col("doc_id"),
      TextAnalysis.fingerprint(content).as("f"))
      .groupBy("f").agg(count(lit(1)).as("n"), min("doc_id"))
      .where(col("n") > 1).count())
    time("full exactDuplicates")(Dedup.exactDuplicates(docs,
      col("doc_id"), content).orderBy("fingerprint").count())
    time("full again")(Dedup.exactDuplicates(docs,
      col("doc_id"), content).orderBy("fingerprint").count())
    spark.stop()
  }
}
