package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.vector.Ann

/** Dev probe: recall@10 of nprobe=8/16 IVF search vs full probe — per
  * single query and as the 20-query mean (the ann_ivf_topk gate runs
  * on the mean: a one-query recall bound flakes across data
  * regenerations, the mean concentrates).
  */
object ProbeIvfRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/tmp/sf1x10")
        if new java.io.File(dir).exists) {
      val emb = Tables.embeddings(spark, dir)
      val idx = Ann.buildIvf(emb, nlist = 16)
      val recalls = (0L until 20L).map { q =>
        val qv = emb.where(col("vec_id") === q)
          .select(col("embedding")).head().getSeq[Float](0)
        val exact = idx.searchL2(qv, k = 10, nprobe = 16)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val approx = idx.searchL2(qv, k = 10, nprobe = 8)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (exact & approx).size
      }
      println(s"$dir per-query=${recalls.mkString(",")} mean=${recalls.sum / 200.0}")
    }
    spark.stop()
  }
}
