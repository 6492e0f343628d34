package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.classify.Cascades
import graft.embed.Embedder

/** Structured-Streaming extension (SURVEY §1.3: the reference is pure
  * request/response, so streaming is an extension, not parity): a
  * file-drop ingest directory replaces the reference's HTTP upload
  * endpoint (S3). New parquet files landing in `inputDir` flow through
  * the same classification + embedding columns as batch ingest and
  * append to the chunk table — identical semantics, incremental
  * execution, exactly-once via the checkpoint.
  */
object StreamingIngest {

  /** Streaming source over a drop directory of parquet document files. */
  def documentStream(spark: SparkSession, inputDir: String,
                     schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(inputDir)

  /** The per-document ingest projection (classification + embedding) —
    * shared shape with batch [[graft.api.Ingest]]; chunking is omitted
    * on the streaming path in round 1 (stateless projections only).
    */
  def ingestColumns(docs: DataFrame, idCol: Column, textCol: Column,
                    courtLevel: Column, embedder: Embedder): DataFrame = {
    val fileName = concat(lit("doc_"), idCol.cast("string"), lit(".pdf"))
    docs.select(
      textCol.as("text"),
      embedder.embed(textCol).as("embedding"),
      fileName.as("file_name"),
      sha2(fileName, 256).as("file_id"),
      courtLevel.cast("int").as("court_level"),
      Cascades.decision(textCol).as("case_decision"))
  }

  /** Start the file-drop → chunk-table pipeline. `Trigger.AvailableNow`
    * drains everything present then stops — the batch-refresh pattern;
    * pass a processing-time trigger for continuous tailing.
    */
  def start(spark: SparkSession, inputDir: String, schema: StructType,
            idCol: String, textCol: String, courtLevel: Column,
            embedder: Embedder, outDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val src = documentStream(spark, inputDir, schema)
    ingestColumns(src, col(idCol), col(textCol), courtLevel, embedder)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Watermarked windowed counts over an event stream — the streaming
    * aggregation shape (10-minute windows, 30-minute late tolerance).
    * `tsCol` must be a timestamp column.
    */
  def windowedEventCounts(events: DataFrame, tsCol: Column,
                          keyCol: Column): DataFrame =
    events
      .withColumn("__ts", tsCol)
      .withWatermark("__ts", "30 minutes")
      .groupBy(window(col("__ts"), "10 minutes"), keyCol)
      .count()
}
