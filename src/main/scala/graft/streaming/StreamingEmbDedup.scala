package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.EmbeddingDedup
import graft.vector.VectorKernels

/** Streaming SELF near-dup detection in EMBEDDING space (25th route):
  * each arriving vector is checked against every vector the stream has
  * ever admitted — semantic dedup at ingest, the vector analog of
  * [[StreamingNearDup]] and the continuous-ingest form of
  * [[graft.dedup.EmbeddingDedup.cosineLshPairs]]. Hyperplane
  * sign-random-projection band keys (Charikar) replace MinHash bands,
  * an ARRAY<FLOAT> vector store replaces the shingle-set store, and
  * exact 4dp-rounded cosine replaces exact Jaccard as the
  * verification; everything else — the bucketed band registry, the
  * maintained screen with the pushed `band_key IN (…)` dirty path,
  * the candidate-id `id IN (…)` vector fetch, batch-id fencing,
  * keep-first registration, size-tiered compaction + incremental
  * screen extension — is [[SelfRegistryDedup]], shared verbatim with
  * the text route.
  *
  * Emitted per input vector: `(id, dup_of, cosine)` — `dup_of` the
  * SMALLEST earlier id whose exact cosine clears `minCosine`, nulls
  * for admitted vectors. Recall is the batch operator's own banding
  * geometry (`bands` × `bits` sign bits; identical-direction vectors
  * share every band deterministically — scaled copies always
  * collide); precision is exact via verification.
  */
object StreamingEmbDedup {

  private val kind = SelfRegistryDedup.Kind(
    label = "emb-dedup", bandsPrefix = "graft_embdedup_bands",
    featsPrefix = "graft_embdedup_vecs", featsSubdir = "vecs",
    featName = "embedding", featSqlType = "ARRAY<FLOAT>")

  private[graft] def bandsTableName(registryDir: String): String =
    SelfRegistryDedup.bandsTableName(kind, registryDir)
  private[graft] def vecsTableName(registryDir: String): String =
    SelfRegistryDedup.featsTableName(kind, registryDir)

  /** [[StreamingNearDup.compact]] for the embedding registries. */
  def compact(spark: SparkSession, registryDir: String, buckets: Int,
              minFileBytes: Long = 0L, rebuildScreen: Boolean = false,
              screenFpp: Double = 1e-6, tierFanout: Int = 0): Unit =
    SelfRegistryDedup.compact(spark, kind, registryDir, buckets,
      minFileBytes, rebuildScreen, screenFpp, tierFanout)

  /** [[StreamingNearDup.maintain]] for the embedding registries —
    * zero-dial, policy-derived ([[MaintenancePolicy]]).
    */
  def maintain(spark: SparkSession, registryDir: String,
               bloomBudgetBytes: Long =
                 MaintenancePolicy.MaxBloomBytesPerBucket):
      Option[MaintenancePolicy.TablePlan] =
    SelfRegistryDedup.maintain(spark, kind, registryDir, bloomBudgetBytes)

  /** [[StreamingNearDup.rebucket]] for the embedding registries. */
  def rebucket(spark: SparkSession, registryDir: String, newBuckets: Int,
               rebuildScreen: Boolean = false,
               screenFpp: Double = 1e-6): Unit =
    SelfRegistryDedup.rebucket(spark, kind, registryDir, newBuckets,
      rebuildScreen, screenFpp)

  /** Start the self embedding-dedup check over `stream`; `write`
    * receives each batch's `(id, dup_of, cosine)`. Parameters mirror
    * [[StreamingNearDup.nearDupStream]]; `dim`/`bands`/`bits`/`seed`
    * are the banding geometry. The default `bands = bits = 0` DERIVES
    * the geometry from the operating point —
    * [[EmbeddingDedup.geometryFor]]`(minCosine)`, recall ≥ 0.95 at
    * the threshold with expected random collisions ∝ true near-dups
    * (at 0.9 that is 30×15; the batch operator's 16×4, sized for
    * 0.35-threshold recall, floods ~one candidate per RANDOM pair at
    * 0.9 — measured: a 3.3k-vector batch went quadratic). Explicit
    * overrides are honored verbatim. Whatever geometry resolves is
    * stamped into the registry's `_GEOMETRY` marker and validated on
    * every (re)open, so a resume under a different geometry fails
    * loudly instead of silently missing every prior registration.
    */
  def embDedupStream(stream: DataFrame, idCol: Column, embCol: Column,
                     registryDir: String,
                     checkpointDir: Option[String] = None,
                     buckets: Int = 8, dim: Int = 64,
                     bands: Int = 0,
                     bits: Int = 0,
                     seed: Long = 42L,
                     minCosine: Double = 0.9,
                     screenCapacity: Long = 4L * 1000 * 1000,
                     screenFpp: Double = 1e-6,
                     registerDups: Boolean = true)
                    (write: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    // a half-specified geometry (bands without bits or vice versa)
    // must fail loudly: silently deriving BOTH would hand the caller a
    // geometry they did not ask for on the dimension they DID pin
    require((bands > 0) == (bits > 0),
      s"bands and bits must be pinned together (got bands=$bands, " +
        s"bits=$bits): pass both explicitly, or leave both 0 to derive " +
        s"the geometry from minCosine")
    val derived = bands == 0
    val (b, r) =
      if (!derived) (bands, bits)
      else EmbeddingDedup.geometryFor(minCosine)
    val planes = EmbeddingDedup.hyperplanes(dim, b, r, seed)
    SelfRegistryDedup.run(
      stream.select(idCol.cast("long").as("id"),
        embCol.cast("array<float>").as("embedding")),
      kind, registryDir, checkpointDir, buckets,
      featurize = batch => batch.withColumn("bands",
        VectorKernels.hyperplaneBandKeys(
          col("embedding"), planes, dim, b, r)),
      verify = (a, b) => round(VectorKernels.cosine(a, b), 4),
      minSim = minCosine, simName = "cosine",
      screenCapacity = screenCapacity, screenFpp = screenFpp,
      registerDups = registerDups,
      geometry = Map("kind" -> "sign-hyperplane", "dim" -> dim.toString,
        "bands" -> b.toString, "bits" -> r.toString,
        "seed" -> seed.toString),
      geometryDerived = derived)(write)
  }
}
