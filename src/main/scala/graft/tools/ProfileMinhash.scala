package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev profiler for the MinHash-LSH pair pipeline stages. */
object ProfileMinhash {
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
    time("shingle hashes")(docs.select(col("doc_id"),
      Dedup.shingleHashes(content, 3).as("sh")).agg(count("sh")).head.getLong(0))
    time("+ signature")(docs.select(col("doc_id"),
      Dedup.minhashSignatureFromHashes(Dedup.shingleHashes(content, 3)).as("sig"))
      .agg(count("sig")).head.getLong(0))
    time("full minhashPairs")(Dedup.minhashPairs(docs, col("doc_id"), content)
      .count())
    time("full again")(Dedup.minhashPairs(docs, col("doc_id"), content).count())
    spark.stop()
  }
}
