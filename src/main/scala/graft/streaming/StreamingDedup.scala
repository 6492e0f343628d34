package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
