package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over a harness scale-factor directory
  * (TESTDATA.md). Every query entry point receives the directory and
  * reads lazily — Catalyst pushes filters/projections into the scan, so
  * at cluster scale only the needed columns/row groups are read.
  *
  * Stands in for the reference's Milvus collection handle
  * (`/root/reference/extract_and_embed.py:37-59` create/load): Parquet
  * needs no explicit "load"; caching is the analog of
  * `load_collection` and is left to callers that reuse a table.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}
