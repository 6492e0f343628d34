package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.text.Bpe

/** Dev profiler for deep BPE training: prints cumulative time at merge
  * checkpoints so the per-round cost can be read off as the successive
  * deltas. With the cadence-16 `localCheckpoint` in
  * [[Bpe.trainMerges]], the deltas should be flat — round 240-256 no
  * more expensive than round 1-16 — instead of growing with the
  * chained-replace lineage.
  */
object ProfileBpeDeep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm the scan
    for (steps <- Seq(16, 64, 128, 256)) {
      val t0 = System.nanoTime()
      val n = Bpe.trainMerges(docs, col("text"), steps).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"steps=$steps%4d  merges=$n%4d  total=$dt%7.2fs  per-round=${dt / steps}%6.3fs")
    }
    spark.stop()
  }
}
