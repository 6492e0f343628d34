package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.classify.Cascades
import graft.sources.Tables

/** r17 triage: is documentAttributes' 18s per-row work or fixed
  * (planning/codegen)? Time sub-expressions at several SFs.
  */
object ProfileAttrs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.queryExecution.toRdd.count()
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    spark.range(100).count()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = Tables.documents(spark, s"/root/testdata/$sf")
      docs.count()
      time(s"$sf docType only")(
        docs.select(Cascades.docType(col("text")).as("dt")))
      time(s"$sf decision only")(
        docs.select(Cascades.decision(col("text")).as("d")))
      time(s"$sf decisionWithRetry")(
        docs.select(Cascades.decisionWithRetry(col("text"), lit("x")).as("d")))
      time(s"$sf attrs full")(graft.api.Ingest.documentAttributes(
        docs, col("doc_id"), col("text"), pmod(col("doc_id"), lit(10)))
        .drop("doc_text"))
      time(s"$sf attrs full AGAIN")(graft.api.Ingest.documentAttributes(
        docs, col("doc_id"), col("text"), pmod(col("doc_id"), lit(10)))
        .drop("doc_text"))
    }
    spark.stop()
  }
}
