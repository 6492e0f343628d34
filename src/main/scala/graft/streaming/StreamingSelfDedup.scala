package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Streaming SELF-dedup substring clip (23rd route) — keep-first span
  * removal WITHIN an arriving stream: each micro-batch is clipped
  * against every n-gram the stream has already emitted (a maintained
  * gram-winner REGISTRY), plus the keep-first election among grams
  * first seen in this batch. The batch operator
  * ([[graft.dedup.Spans.clipSpans]]) answers "dedup this corpus"; this
  * route answers "dedup the corpus as it arrives" — the ingest-time
  * form, where a document's text is final the moment it is emitted.
  *
  * Semantics are PREFIX-CAUSAL and batch-boundary-independent (the
  * [[graft.dedup.Spans.clipSpansPrefixStep]] contract): the loser set
  * equals the batch operator's exactly; winner protection is limited
  * to intra-document duplication, because protection based on a
  * duplicate that has not arrived yet would require editing
  * already-emitted output. The whole stream therefore sits under the
  * exact full-corpus [[graft.dedup.Spans.clipSpansPrefixSql]] oracle
  * when fed in doc_id order.
  *
  * Scale shape: the registry is an append-only parquet table of
  * (xxhash64, gram) rows — at 100 TB it lives hash-BUCKETED so the
  * per-batch probe is a bucket-local join that shuffles only the
  * batch's seeds, the [[StreamingBm25]] postings pattern. Replays
  * (at-least-once) re-emit deterministic rows and may re-append
  * registry rows; duplicates cannot change any future clip (interval
  * union is idempotent, the anti-join is set-semantics), so an
  * idempotent sink makes the route exactly-once.
  */
object StreamingSelfDedup {

  /** Start the self-dedup clip over `stream`; `write` receives each
    * batch's (doc_id, clean_text, n_removed). `registryDir` holds the
    * maintained gram registry (created on first batch).
    */
  def clipStream(stream: DataFrame, idCol: Column, textCol: Column,
                 minTokens: Int, registryDir: String,
                 checkpointDir: Option[String] = None)
                (write: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream
      .select(idCol.cast("long").as("doc_id"),
        textCol.cast("string").as("text"))
      .writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val s = batch.sparkSession
      val regPath = new org.apache.hadoop.fs.Path(registryDir)
      val fs = regPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      // batch-id fencing makes the REPLAY correct, not just tolerated:
      // a crash after the registry append but before the offset commit
      // re-runs this batch with its own grams already in the registry
      // — without the fence the replay would clip the batch's own
      // first occurrences as "already seen". Probing only rows from
      // STRICTLY EARLIER batches makes the replayed view identical to
      // the original run's; the duplicate append re-lands under the
      // same batch_id and stays invisible to every later probe's
      // `< batchId` filter... (it IS visible to batch_id+1 — exactly
      // once, as the original rows would have been).
      val registry =
        if (fs.exists(regPath))
          s.read.parquet(registryDir)
            .where(col("batch_id") < batchId).select("h", "gram")
        else {
          import s.implicits._
          Seq.empty[(Long, String)].toDF("h", "gram")
        }
      val (clipped, newGrams) = graft.dedup.Spans.clipSpansPrefixStep(
        batch, col("doc_id"), col("text"), registry, minTokens)
      write(clipped)
      newGrams.select(col("h"), col("gram"),
          org.apache.spark.sql.functions.lit(batchId).as("batch_id"))
        .write.mode("append").parquet(registryDir)
      ()
    }.start()
  }
}
