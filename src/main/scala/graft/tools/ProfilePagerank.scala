package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.operators.PageRank
import graft.sources.Tables

/** Dev profiler: split dedup_pagerank's cost into edge mining vs the
  * rank iterations, at 1x and (if present) the 10x ScaleData corpus.
  */
object ProfilePagerank {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/sf1x10")
         if new java.io.File(dir).exists) {
      println(s"== $dir")
      val docs = Tables.documents(spark, dir)
      val t = Enrich.dedupContent(col("text"), col("doc_id"))
      val edges = time("edge mining") {
        val e = Dedup.ngramJaccardPairsPrefix(docs, col("doc_id"), t)
          .select("id_a", "id_b").localCheckpoint()
        println(s"  edges=${e.count()}")
        e
      }
      time("pagerank 5 iters")(PageRank.pagerank(edges).count())
    }
    spark.stop()
  }
}
