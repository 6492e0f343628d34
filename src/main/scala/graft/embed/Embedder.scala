package graft.embed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F4 — the embedding transform
  * (`/root/reference/extract_and_embed.py:80-82`), as a pluggable
  * column operator.
  *
  * The reference calls OpenAI ada-002 once per chunk, sequentially —
  * the single worst scaling pathology in the reference (SURVEY §3
  * "performance pathologies"). Here embedding is a Column: it rides in
  * the chunk projection, is computed partition-parallel, and external
  * implementations batch per partition instead of per row.
  */
trait Embedder {
  def dim: Int

  /** Embedding of a text column as `array<float>` of [[dim]]. */
  def embed(text: Column): Column
}

/** Deterministic seeded hash-projection embedder — the offline
  * correctness stand-in for ada-002 (the external model is
  * non-deterministic and unavailable without egress; SURVEY §7.3).
  * Component j = xxhash64(text, j, seed) folded into [-1, 1). Fixed
  * text + seed → fixed vector; fully codegen-friendly, no UDF.
  */
final case class DeterministicEmbedder(dim: Int = 64, seed: Long = 42L) extends Embedder {
  private val Bucket = 2000001L

  def embed(text: Column): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      ((pmod(xxhash64(text, j, lit(seed)), lit(Bucket)) - lit(1000000L))
        .cast("double") / 1000000.0).cast("float"))
}

/** Placeholder for the reference's remote ada-002 client. Kept as an
  * explicit boundary: a real implementation must batch requests per
  * partition (mapPartitions over an iterator of chunks), never one RPC
  * per row like the reference. Unavailable in this offline harness.
  */
final case class RemoteEmbedder(model: String = "text-embedding-ada-002") extends Embedder {
  def dim: Int = 1536
  def embed(text: Column): Column =
    throw new UnsupportedOperationException(
      "remote embedding service unavailable offline; use DeterministicEmbedder")
}
