package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.dedup.Dedup
import graft.api.Enrich
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, dir)
      val content = Enrich.dedupContent(col("text"), col("doc_id"))
      val lsh = Dedup.minhashPairs(docs, col("doc_id"), content).select("id_a", "id_b")
      val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), content).select("id_a", "id_b")
      val nE = exact.count(); val nF = exact.join(lsh, Seq("id_a","id_b")).count()
      println(s"$dir  exact=$nE found=$nF recall=${nF.toDouble/nE}")
    }
    spark.stop()
  }
}
