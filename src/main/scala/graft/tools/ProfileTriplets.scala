package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profile: exact vs LSH triplet mining on a corpus dir. */
object ProfileTriplets {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    emb.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-10s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    time("exact") {
      graft.ml.Triplets.mine(emb, col("vec_id"), col("embedding"),
        col("label")).count()
    }
    time("lsh16x4") {
      graft.ml.Triplets.mineLsh(emb, col("vec_id"), col("embedding"),
        col("label"), dim = 64).count()
    }
    time("lsh8x8") {
      graft.ml.Triplets.mineLsh(emb, col("vec_id"), col("embedding"),
        col("label"), dim = 64, bands = 8, bits = 8).count()
    }
    spark.stop()
  }
}
