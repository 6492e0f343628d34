package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

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
  * Scale shape: the registry is an append-only table of (xxhash64,
  * gram, batch_id) rows that grows for the life of the stream — the
  * one input the per-batch probe must not re-shuffle. With
  * `registryBuckets > 0` it lives as a HASH-BUCKETED catalog table
  * (the [[StreamingBm25]] postings shape): each append writes
  * bucket-aligned files, the probe reads through the bucketed scan,
  * and both registry joins cluster on `h`, so only the BATCH's seeds
  * shuffle — the registry never re-partitions
  * (StreamingSelfDedupSpec pins the exchange count). Appends leave
  * one file per bucket per batch; reap with
  * [[StreamingBm25.compact]] (bucket-preserving) between runs.
  * `registryBuckets = 0` appends a plain parquet dir — the
  * harness-scale form. Replays (at-least-once) re-emit deterministic
  * rows and may re-append registry rows; duplicates cannot change any
  * future clip (interval union is idempotent, the anti-join is
  * set-semantics), so an idempotent sink makes the route exactly-once.
  */
object StreamingSelfDedup {

  /** Catalog name for a bucketed registry at `registryDir` — derived
    * from the dir so concurrent streams in one session cannot collide.
    */
  private[streaming] def registryTableName(registryDir: String): String = {
    val bytes = registryDir.getBytes("UTF-8")
    // hash the byte array's FULL length — String.length counts chars,
    // and truncating a multi-byte path's tail would collide two dirs
    // differing only in their final bytes onto one catalog table
    s"graft_selfdedup_reg_${java.lang.Long.toHexString(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42) & 0xFFFFFFFFL)}"
  }

  /** Start the self-dedup clip over `stream`; `write` receives each
    * batch's (doc_id, clean_text, n_removed). `registryDir` holds the
    * maintained gram registry (created on first batch), as a plain
    * parquet dir (`registryBuckets = 0`) or an `h`-bucketed catalog
    * table (`> 0` — the scale form).
    */
  def clipStream(stream: DataFrame, idCol: Column, textCol: Column,
                 minTokens: Int, registryDir: String,
                 checkpointDir: Option[String] = None,
                 registryBuckets: Int = 0)
                (write: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream
      .select(idCol.cast("long").as("doc_id"),
        textCol.cast("string").as("text"))
      .writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    val tbl = registryTableName(registryDir)
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
      // checkpoint resume in a FRESH session: the files survive but the
      // session catalog is empty — re-register the bucketed table over
      // them (bucket identity lives in the part-file names), or the
      // first post-restart batch would silently probe an EMPTY
      // registry and re-emit previously-clipped grams. The bucket mode
      // is part of the registry dir's on-disk contract: re-registering
      // plain-dir files as bucketed fails loudly at read, never
      // silently.
      if (registryBuckets > 0 && !s.catalog.tableExists(tbl) &&
        fs.exists(regPath))
        s.sql(s"CREATE TABLE $tbl (h BIGINT, gram STRING, batch_id BIGINT) " +
          s"USING parquet CLUSTERED BY (h) SORTED BY (h) " +
          s"INTO $registryBuckets BUCKETS LOCATION '$registryDir'")
      val registry =
        if (registryBuckets > 0 && s.catalog.tableExists(tbl)) {
          // this batch must see the previous batch's append: refresh
          // the (micro-batch-session) catalog's cached file listing
          s.catalog.refreshTable(tbl)
          s.table(tbl).where(col("batch_id") < batchId).select("h", "gram")
        } else if (registryBuckets == 0 && fs.exists(regPath))
          s.read.parquet(registryDir)
            .where(col("batch_id") < batchId).select("h", "gram")
        else {
          import s.implicits._
          Seq.empty[(Long, String)].toDF("h", "gram")
        }
      val (clipped, newGrams) = graft.dedup.Spans.clipSpansPrefixStep(
        batch, col("doc_id"), col("text"), registry, minTokens)
      write(clipped)
      val out = newGrams.select(col("h"), col("gram"),
        lit(batchId).as("batch_id"))
      if (registryBuckets > 0)
        out.write.mode("append").format("parquet")
          .option("path", registryDir)
          .bucketBy(registryBuckets, "h").sortBy("h")
          .saveAsTable(tbl)
      else
        out.write.mode("append").parquet(registryDir)
      ()
    }.start()
  }
}
