package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.TextAnalysis

/** Dev profiler for the n-gram count pipeline stages. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    spark.range(100).count()
    docs.count()
    val toks = split(lower(trim(col("text"))), "\\s+")
    time("tokenize+size only")(docs.select(size(toks).as("n"))
      .agg(sum("n")).collect().head.getLong(0))
    time("explode tokens")(docs.select(explode(toks).as("t"))
      .groupBy("t").count().count())
    val grams = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => array_join(slice(toks, i, lit(2)), " ")))
      .otherwise(array().cast("array<string>"))
    time("bigram explode only")(docs.select(explode(grams).as("g")).count())
    time("bigram groupBy")(docs.select(explode(grams).as("g"))
      .groupBy("g").agg(count(lit(1))).count())
    time("full ngramCounts")(TextAnalysis.ngramCounts(docs, col("text"), 2)
      .orderBy(desc("cnt"), asc("ngram")).limit(50).count())
    time("full again")(TextAnalysis.ngramCounts(docs, col("text"), 2)
      .orderBy(desc("cnt"), asc("ngram")).limit(50).count())
    spark.stop()
  }
}
