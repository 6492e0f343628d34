package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** Load a harness table, normalizing timestamp physicalities the
    * fixture generator has varied across rounds: columns written as
    * TIMESTAMP(isAdjustedToUTC=false) arrive as TIMESTAMP_NTZ, which
    * rejects comparisons against TIMESTAMP literals and most epoch
    * functions — cast them to session-time TIMESTAMP (every entry
    * point pins `spark.sql.session.timeZone=UTC`, matching DuckDB's
    * naive-timestamp reading of the same files, so the epoch values
    * are identical in both engines).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      else d
    }
  }

  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  /** `events` with `ts` under the engine contract: epoch-NANOS long.
    * The fixture has shipped both TIMESTAMP(NANOS) (read as long via
    * `nanosAsLong`) and TIMESTAMP(MICROS) (read as a timestamp and
    * converted here) — downstream temporal operators do pure integer
    * nanos arithmetic either way, and the DuckDB oracles read the same
    * files through `epoch_ns(ts)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType      => df
      case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case other => throw new IllegalArgumentException(
        s"events.ts: expected epoch-nanos long or timestamp, got $other")
    }
  }
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}
