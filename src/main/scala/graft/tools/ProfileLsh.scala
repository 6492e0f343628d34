package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.sources.Tables

/** Dev profiler for the MinHash/LSH pipeline stages. */
object ProfileLsh {
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
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val base = docs.select(col("doc_id").as("id"),
      array_distinct(Dedup.shingles(content)).as("sh"))
    time("shingles")(base.count())
    val withSig = base.withColumn("sig", Dedup.minhashSignature(col("sh")))
    time("signature")(withSig.count())
    time("signature-forced") {
      withSig.select(max(element_at(col("sig"), 1))).head(); withSig.count()
    }
    val withBands = withSig.withColumn("bands", Dedup.bandKeys(col("sig")))
    time("bands-forced") {
      withBands.select(max(element_at(col("bands"), 1))).head(); withBands.count()
    }
    val exploded = withBands.select(col("id"), explode(col("bands")).as("band_key"))
    time("exploded")(exploded.count())
    val cands = exploded.as("l")
      .join(exploded.as("r"), col("l.band_key") === col("r.band_key")
        && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    time("cands")(cands.count())
    time("full")(Dedup.minhashPairs(docs, col("doc_id"), content).count())
    spark.stop()
  }
}
