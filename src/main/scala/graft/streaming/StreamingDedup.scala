package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, ShingleKernel}
import graft.text.TextAnalysis

/** Incremental exact deduplication — the streaming counterpart of
  * [[graft.dedup.Dedup.exactDuplicates]] for continuous ingest (the
  * reference re-embeds every uploaded PDF even when the same file is
  * posted twice; `/root/reference/extract_and_embed.py:141-200` has no
  * dedup anywhere). Running this in front of the embedding stage is
  * the single biggest cost lever a continuous 100 TB pipeline has:
  * every dropped duplicate saves an embedding call downstream.
  *
  * Scale design: the dedup key is the 128-bit content fingerprint —
  * state per UNIQUE document seen inside the watermark horizon, not
  * per event. `dropDuplicatesWithinWatermark` lets the state store
  * evict fingerprints once the watermark passes them, so state is
  * bounded by (unique docs per horizon), not by stream lifetime —
  * unbounded-lifetime exact dedup is not expressible with finite
  * state, and the horizon makes the tradeoff explicit. Near-dup
  * tiers (MinHash and embedding LSH) compose the same way: their
  * band keys are just coarser fingerprints.
  */
object StreamingDedup {

  /** Keep the first arrival of each distinct (whitespace-normalized)
    * document content inside the watermark horizon; later copies are
    * dropped. Input must carry (`ts` timestamp, `textCol`); all input
    * columns pass through, plus the `fingerprint` used as the key.
    */
  def firstArrivals(docs: DataFrame, textCol: String,
                    watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** The banded-signature side of the stream-vs-corpus near-dup check:
    * (id, sh sorted shingle hashes, bands all band keys, band_idx +
    * band_key exploded). Build once over the corpus and reuse across
    * micro-batches; the same shape is computed per-batch on the stream.
    */
  def bandedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
        Dedup.shingleHashes(col(textCol)).as("sh"))
      .withColumn("bands", ShingleKernel.bandHash64(
        Dedup.minhashSignatureFromHashes(col("sh")), Dedup.NumBands))
    base.select(col("id"), col("sh"), col("bands"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
  }

  /** Near-duplicate check of a document STREAM against a STATIC
    * corpus — the continuous-ingest question ("is this new document a
    * near-copy of anything we already hold?") answered without any
    * stream state: a stream-static equi-join on (band index, band key)
    * is stateless, so there is no watermark, no state store, and no
    * buffer growth; the static index is built once and reused every
    * micro-batch.
    *
    * A colliding pair can match in several bands; emitting once per
    * band would duplicate pairs, and de-duplicating with `distinct`
    * would make the stream STATEFUL. Instead a scalar predicate keeps
    * only the FIRST band both signatures agree on — exactly one row
    * per (new doc, corpus dup) per micro-batch, still stateless.
    * Candidates are then verified with the exact Jaccard.
    */
  def nearDupsAgainstCorpus(stream: DataFrame, corpus: DataFrame,
                            idCol: String, textCol: String,
                            minJaccard: Double = 0.5): DataFrame = {
    val idx = bandedIndex(corpus, idCol, textCol)
      .select(col("id").as("dup_of"), col("sh").as("c_sh"),
        col("bands").as("c_bands"), col("band_idx"), col("band_key"))
    val s = bandedIndex(stream, idCol, textCol)
      .select(col("id").as("new_id"), col("sh").as("s_sh"),
        col("bands").as("s_bands"), col("band_idx"), col("band_key"))
    s.join(idx, Seq("band_idx", "band_key"))
      .where(array_position(
        zip_with(col("s_bands"), col("c_bands"), (a, b) => a === b),
        true) === col("band_idx") + 1)
      .select(col("new_id"), col("dup_of"),
        Dedup.jaccardSorted(col("s_sh"), col("c_sh")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }
}
