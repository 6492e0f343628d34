package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.TextAnalysis

/** Incremental BM25 index maintenance — the lexical sibling of
  * [[StreamingIvf]]: the postings table is batch-built once
  * ([[TextAnalysis.buildBm25Index]] — token-bucketed, so serving joins
  * run with zero postings-side exchanges), and arriving documents keep
  * it fresh by appending their postings INTO THE SAME BUCKET LAYOUT
  * and refreshing the 1-row corpus stats. Serving
  * ([[TextAnalysis.bm25JoinIndexed]]) needs no code change: document
  * frequencies and scores are derived from the postings table at query
  * time, so a query issued after any number of appended batches sees
  * exactly the index a full rebuild would produce.
  *
  * Scale design: each micro-batch is tokenize → per-doc tf aggregate →
  * one bucketed append (batch bucketBy inside foreachBatch — the
  * streaming parquet sink cannot bucket) → a stats overwrite derived
  * from the postings table's pruned (id, dl) columns. No state store,
  * no watermark: the INDEX is the state, exactly where a serving
  * system wants it. Callers ingesting documents with ids already
  * indexed should dedup upstream ([[StreamingDedup]]) or compact with
  * [[graft.operators.Upsert]] semantics at rebuild time — appends are
  * add-only, the same contract as the reference's insert-only vector
  * store.
  */
object StreamingBm25 {

  /** The batch-build's postings derivation, shared per micro-batch:
    * (id, dl, token, tf).
    */
  private def postingsOf(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    docs.select(col(idCol).as("id"), size(toks).cast("long").as("dl"),
        explode(toks).as("token"))
      .groupBy("id", "dl", "token").agg(count(lit(1)).as("tf"))
  }

  /** Start the maintenance sink over a document stream: per batch,
    * append postings into `table` (must exist — built by
    * [[TextAnalysis.buildBm25Index]]) under the same bucket spec, then
    * refresh `<table>_stats`.
    */
  def maintain(stream: DataFrame, idCol: String, textCol: String,
               table: String, path: String, checkpointDir: String,
               numBuckets: Int = 32): StreamingQuery = {
    // foreachBatch executes under a micro-batch CLONE of the session;
    // a refreshTable there invalidates only the clone's relation
    // cache, and the serving session keeps reading the pre-append file
    // listing. Capture the serving session now and refresh ITS catalog
    // after every append.
    val serveSession = stream.sparkSession
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // foreachBatch is AT-LEAST-ONCE: after a crash the last batch
        // replays, and a blind append would double its postings
        // (doubling tf/df in every served score). A per-batch marker
        // file makes the append idempotent — the standard manual
        // exactly-once pattern for non-transactional batch sinks.
        val marker = new org.apache.hadoop.fs.Path(
          s"$path/__batches/batch-$batchId")
        val fs = marker.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          postingsOf(batch, idCol, textCol)
            .repartition(numBuckets, col("token"))
            .write.mode(SaveMode.Append)
            .format("parquet")
            .option("path", path)
            .bucketBy(numBuckets, "token")
            .sortBy("token")
            .saveAsTable(table)
          spark.catalog.refreshTable(table)
          spark.table(table)
            .select(col("id"), col("dl")).distinct()
            .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
            .write.mode(SaveMode.Overwrite)
            .format("parquet").option("path", s"$path/__stats")
            .saveAsTable(s"${table}_stats")
          spark.catalog.refreshTable(s"${table}_stats")
          serveSession.catalog.refreshTable(table)
          serveSession.catalog.refreshTable(s"${table}_stats")
          fs.create(marker, true).close()
        }
        ()
      }
      .start()
  }
}
