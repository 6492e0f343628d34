package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, ShingleKernel}

/** Streaming SELF near-dup detection (24th route) — MinHash/LSH
  * deduplication of a stream AGAINST ITSELF: each arriving document is
  * checked against every document the stream has already admitted, via
  * a maintained on-disk BAND REGISTRY that grows with the stream. The
  * batch operator ([[graft.dedup.Dedup.minhashPairs]]) answers "find
  * near-dup pairs in this corpus"; [[StreamingDedup]] answers "is this
  * new document a near-copy of a FIXED corpus"; this route answers the
  * continuous-ingest form of the first: "is this new document a
  * near-copy of anything that has EVER streamed past" — keep-first
  * semantics, the shape a 100 TB training-data ingest actually runs
  * (NewDoc → near-dup of history? drop : admit+register).
  *
  * Semantics are PREFIX-CAUSAL like [[StreamingSelfDedup]]: a document
  * is compared against strictly earlier documents (earlier batches via
  * the registry, earlier ids within its own batch via a batch-local
  * band join), so feeding a corpus in id order reproduces the batch
  * operator's keep-earliest verdicts exactly — the whole stream sits
  * under a full-corpus exact-Jaccard oracle.
  *
  * Emitted per input document: `(id, dup_of, jaccard)` where `dup_of`
  * is the SMALLEST earlier id whose verified exact Jaccard clears
  * `minJaccard` (null for admitted documents) and `jaccard` is that
  * pair's value. LSH recall caveats are the batch operator's own:
  * a qualifying pair is found iff some band collides (identical
  * shingle sets always collide; the 8×8 banding catches J ≳ 0.77 with
  * high probability).
  *
  * The registry/screen/fencing machinery — and its scale shape (only
  * the BATCH's band keys shuffle; shingle sets fetched only for
  * band-colliding candidate ids via the pushed `id IN (…)`; clean
  * batches fold both registry scans away entirely) — is
  * [[SelfRegistryDedup]], shared with the embedding-space sibling
  * [[StreamingEmbDedup]]. This object contributes the TEXT kind:
  * shingle-hash sets as the feature, MinHash band keys, exact Jaccard
  * verification.
  */
object StreamingNearDup {

  private val kind = SelfRegistryDedup.Kind(
    label = "near-dup", bandsPrefix = "graft_neardup_bands",
    featsPrefix = "graft_neardup_docs", featsSubdir = "docs",
    featName = "sh", featSqlType = "ARRAY<BIGINT>")

  private[graft] def bandsTableName(registryDir: String): String =
    SelfRegistryDedup.bandsTableName(kind, registryDir)
  private[graft] def docsTableName(registryDir: String): String =
    SelfRegistryDedup.featsTableName(kind, registryDir)

  /** Fold both registries' append residue back toward ≤1 file per
    * bucket ([[StreamingBm25.compact]]'s staged-manifest protocol;
    * `minFileBytes` makes it size-tiered) and optionally refresh the
    * band registry's [[BucketScreen]] so the stream's maintained
    * screen revives/upgrades at its next batch. Run between batches
    * (single maintenance writer).
    */
  def compact(spark: SparkSession, registryDir: String, buckets: Int,
              minFileBytes: Long = 0L, rebuildScreen: Boolean = false,
              screenFpp: Double = 1e-6, tierFanout: Int = 0): Unit =
    SelfRegistryDedup.compact(spark, kind, registryDir, buckets,
      minFileBytes, rebuildScreen, screenFpp, tierFanout)

  /** Zero-dial maintenance window ([[SelfRegistryDedup.maintain]]):
    * compaction floor/fanout and the screen extend-vs-rebuild decision
    * all derive from observed registry stats
    * ([[MaintenancePolicy]]); returns the derived plan (surface its
    * `rebucketTo` recommendation) or None until the registry exists.
    */
  def maintain(spark: SparkSession, registryDir: String,
               bloomBudgetBytes: Long =
                 MaintenancePolicy.MaxBloomBytesPerBucket):
      Option[MaintenancePolicy.TablePlan] =
    SelfRegistryDedup.maintain(spark, kind, registryDir, bloomBudgetBytes)

  /** Rewrite both registries at `newBuckets` buckets — the lifecycle
    * op for a registry that outlived its initial sizing; see
    * [[SelfRegistryDedup.rebucket]] (staged-manifest, roll-forward,
    * refuses under a live same-JVM stream). The next stream start must
    * pass the NEW bucket count.
    */
  def rebucket(spark: SparkSession, registryDir: String, newBuckets: Int,
               rebuildScreen: Boolean = false,
               screenFpp: Double = 1e-6): Unit =
    SelfRegistryDedup.rebucket(spark, kind, registryDir, newBuckets,
      rebuildScreen, screenFpp)

  /** Start the self near-dup check over `stream`; `write` receives
    * each batch's `(id, dup_of, jaccard)` — every input document, with
    * `dup_of`/`jaccard` null for admitted (non-duplicate) documents.
    * The registries are created under `registryDir` on first batch.
    * `screenCapacity`/`screenFpp` size the maintained band-key screen
    * (0 disables it); see [[StreamingSelfDedup.clipStream]] for the
    * fpp sizing argument (the skip is all-or-nothing per batch).
    *
    * `registerDups = false` registers only ADMITTED documents — the
    * keep-first production setting, where the registry grows with
    * UNIQUE content instead of stream volume (a boilerplate-heavy
    * corpus's dup orbit adds one registrant, not thousands). Verdicts
    * then compare against surviving keepers only: a transitive chain
    * A≈B, B≈C with A≉C admits C (B was never registered) — the
    * standard keep-first transitivity tradeoff, while identical
    * orbits still resolve to their keeper (the keeper collides with
    * every member). Within-batch candidates are unaffected (the
    * batch-local join sees all earlier-in-batch rows either way). The
    * default `true` matches the all-pairs batch operator exactly and
    * sits under the gate's oracle.
    */
  /** `numBands = 0` (the default) DERIVES the banding from the
    * operating point — [[Dedup.geometryFor]]`(minJaccard)`: the
    * fewest bands over the fixed 64-permutation signature whose
    * analytic recall at the threshold clears 0.95 (8 at 0.9 — the
    * historical default — 16 at the 0.77 knee, 32 at 0.5). The
    * resolved geometry is stamped into the registry's `_GEOMETRY`
    * marker and validated on every (re)open, so a resume under a
    * different shingle n or band count fails loudly instead of
    * silently missing every prior registration.
    */
  def nearDupStream(stream: DataFrame, idCol: Column, textCol: Column,
                    registryDir: String,
                    checkpointDir: Option[String] = None,
                    buckets: Int = 8, shingleN: Int = 3,
                    minJaccard: Double = 0.9,
                    numBands: Int = 0,
                    screenCapacity: Long = 4L * 1000 * 1000,
                    screenFpp: Double = 1e-6,
                    registerDups: Boolean = true)
                   (write: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val bands =
      if (numBands > 0) numBands else Dedup.geometryFor(minJaccard)
    SelfRegistryDedup.run(
      stream.select(idCol.cast("long").as("id"),
        textCol.cast("string").as("text")),
      kind, registryDir, checkpointDir, buckets,
      featurize = batch => batch
        .withColumn("sh", Dedup.shingleHashes(col("text"), shingleN))
        .withColumn("bands", ShingleKernel.bandHash64(
          Dedup.minhashSignatureFromHashes(col("sh")), bands)),
      verify = Dedup.jaccardSorted, minSim = minJaccard,
      simName = "jaccard", screenCapacity = screenCapacity,
      screenFpp = screenFpp, registerDups = registerDups,
      geometry = Map("kind" -> "minhash-jaccard",
        "shingle_n" -> shingleN.toString,
        "perms" -> Dedup.NumPerms.toString,
        "bands" -> bands.toString),
      geometryDerived = numBands == 0)(write)
  }
}
