package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.classify.{Cascades, CaseMetadata, DecisionRules}
import graft.sources.Tables

/** r17 triage #2: prove the attrs cost is expression re-evaluation
  * (meta/lower duplicated per cascade branch) by timing a staged
  * variant that materializes meta + lowered text once.
  */
object ProfileAttrs2 {
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
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()

    val page1 = substring(col("text"), 1, 3500)
    val staged = docs.select(
      col("doc_id"), col("text"),
      regexp_extract(page1, CaseMetadata.partiesPattern, 0).as("__pm"),
      CaseMetadata.caseNumber(page1).as("__cn"))
    time("staged __pm/__cn only")(staged.drop("text"))

    val meta = concat_ws(" ",
      col("__cn"),
      trim(regexp_extract(col("__pm"), CaseMetadata.partiesPattern, 1)),
      trim(regexp_extract(col("__pm"), CaseMetadata.partiesPattern, 2)))
    time("staged + meta col")(
      staged.select(col("doc_id"), col("text"), trim(meta).as("__meta"))
        .drop("text"))

    // current shape: decisionWithRetry over (text, trim(meta)) directly
    time("current: retry(text, meta expr)")(
      staged.select(col("doc_id"),
        Cascades.decisionWithRetry(col("text"), trim(meta)).as("d")))

    // staged shape: meta materialized, then retry over columns
    val withMeta = staged.select(col("doc_id"), col("text"), trim(meta).as("__meta"))
    time("staged: retry(text, meta col)")(
      withMeta.select(col("doc_id"),
        Cascades.decisionWithRetry(col("text"), col("__meta")).as("d")))

    // fully staged: initial + enriched text materialized, cascade on cols
    val withInit = withMeta.select(col("doc_id"), col("text"), col("__meta"),
      Cascades.decision(col("text")).as("__init"),
      concat(col("__meta"), lit("\n\n"), col("text")).as("__etext"))
    time("fully staged: init col + enriched col")(
      withInit.select(col("doc_id"),
        when(col("__init") === DecisionRules.Invalid && length(col("__meta")) > 0,
          Cascades.decision(col("__etext")))
          .otherwise(col("__init")).as("d")))

    spark.stop()
  }
}
