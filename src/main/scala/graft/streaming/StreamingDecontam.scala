package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.text.BloomKernel

/** Streaming benchmark-decontamination screen — the admission-time
  * form of the batch `text_decontaminate_bloom` gate: documents
  * arriving on a stream are annotated with whether any of their
  * n-gram shingles appears in a benchmark suite, BEFORE they reach
  * the training corpus. Contamination caught at ingest costs one
  * dropped document; caught after training it costs the benchmark.
  *
  * Scale design: completely STATELESS — the benchmark's shingle set
  * is compiled ONCE into a Bloom filter (benchmark-sized, typically
  * ≪ MB) that ships to executors inside the codegen'd
  * [[BloomKernel]] predicate; each micro-batch is then a narrow
  * map + aggregation per document. No state store, no watermark, no
  * join buffer — the filter is the only cross-batch artifact, and
  * rebuilding it when the benchmark suite changes is a batch-side
  * concern. False positives (rate `fpp`) can only over-flag: a
  * screening decision errs toward quarantine, never toward silently
  * admitting a contaminated document.
  */
object StreamingDecontam {

  /** Compile the benchmark suite's distinct shingle set into a Bloom
    * filter (batch side, run once per suite version).
    */
  def benchmarkFilter(benchmark: DataFrame, textCol: Column, n: Int = 3,
                      fpp: Double = 0.01): BloomFilter = {
    val shingles = benchmark
      .select(explode(array_distinct(
        graft.dedup.Dedup.shingles(textCol, n))).as("shingle"))
      .distinct()
    val count = math.max(shingles.count(), 1L)
    shingles.stat.bloomFilter(xxhash64(col("shingle")), count, fpp)
  }

  /** Annotate a document STREAM with per-document flagged-shingle
    * counts against the compiled benchmark filter. Input carries
    * (`idCol`, `textCol`); output is (id, n_shingles, n_flagged,
    * contaminated) per document.
    *
    * A pure PROJECTION — the per-document count is a higher-order
    * `filter` over the shingle array, not an explode + aggregation,
    * so the query needs no watermark, no output-mode negotiation, and
    * no state: exactly one output row per input row, append-safe by
    * construction.
    */
  def screen(stream: DataFrame, idCol: Column, textCol: Column,
             filter: BloomFilter, n: Int = 3): DataFrame =
    stream
      .select(idCol.as("id"),
        array_distinct(graft.dedup.Dedup.shingles(textCol, n)).as("__sh"))
      .select(col("id"),
        size(col("__sh")).cast("long").as("n_shingles"),
        size(org.apache.spark.sql.functions.filter(col("__sh"),
          s => BloomKernel.mightContainLong(xxhash64(s), filter)))
          .cast("long").as("n_flagged"))
      .select(col("id"), col("n_shingles"), col("n_flagged"),
        (col("n_flagged") > 0L).as("contaminated"))

  /** Streaming decontamination CLIP — the screen composed with the
    * surgical removal: each micro-batch is bloom-screened IN-ROW
    * (stateless codegen probe), and only FLAGGED documents pay the
    * exact [[graft.dedup.Spans.clipAgainst]] gram join; unflagged
    * documents pass through verbatim with n_removed = 0.
    *
    * Exactness: the Bloom filter has NO false negatives, so every
    * document carrying a benchmark n-gram reaches the exact clip; a
    * false positive is exact-clipped with nothing to remove and comes
    * back verbatim. The streamed output therefore row-for-row EQUALS
    * batch [[graft.dedup.Spans.clipAgainst]] over the same documents
    * at ANY fpp — which is how the route sits under the batch oracle
    * (fpp only moves the fraction paying the join, never a byte of
    * output).
    *
    * Scale shape: per micro-batch, the benchmark gram join runs over
    * the flagged fraction only (≈ true contamination rate + fpp); the
    * screen itself is a narrow projection. foreachBatch is the right
    * harness — the clip is a per-batch BATCH transform with no
    * cross-batch state beyond the compiled filter. `write` receives
    * each batch's (doc_id, clean_text, n_removed) output; replays
    * (at-least-once) re-emit the same deterministic rows, so an
    * idempotent sink (upsert on doc_id) makes the route exactly-once.
    */
  def clipStream(stream: DataFrame, idCol: Column, textCol: Column,
                 bench: DataFrame, benchTextCol: Column,
                 filter: BloomFilter, minTokens: Int,
                 checkpointDir: Option[String] = None)
                (write: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    // the benchmark gram table is immutable for the life of the query
    // — derive it ONCE (like the bloom filter) instead of re-exploding
    // the bench corpus inside every micro-batch
    val benchGrams = graft.dedup.Spans
      .benchGramsOf(bench, benchTextCol, minTokens).localCheckpoint()
    val writer = stream
      .select(idCol.cast("long").as("doc_id"),
        textCol.cast("string").as("text"))
      .writeStream
    // a pinned checkpoint is the resume contract: a restarted query
    // continues from the committed offset, and an uncommitted last
    // batch replays — deterministic rows, so an idempotent sink
    // (upsert on doc_id) makes the route exactly-once
    // (StreamingResumeSpec proves both halves)
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: DataFrame, _: Long) =>
        val screened = batch.withColumn("__flagged",
          exists(array_distinct(
            graft.dedup.Dedup.shingles(col("text"), minTokens)),
            s => BloomKernel.mightContainLong(xxhash64(s), filter)))
          .localCheckpoint() // consumed 2-3x below; batch-sized
        val clean = screened.where(!col("__flagged"))
          .select(col("doc_id"), col("text").as("clean_text"),
            lit(0L).as("n_removed"))
        val flagged = screened.where(col("__flagged"))
        // a batch with nothing flagged skips the gram join entirely
        write(
          if (flagged.isEmpty) clean
          else clean.unionByName(graft.dedup.Spans.clipAgainstGrams(
            flagged, col("doc_id"), col("text"), benchGrams, minTokens)))
        ()
      }.start()
  }
}
