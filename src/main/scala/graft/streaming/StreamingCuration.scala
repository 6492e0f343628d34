package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming admission control — the continuous-ingest counterpart of
  * [[graft.text.Curation.domainTokenBudget]]: each domain may admit
  * documents until its lifetime token budget is spent; everything
  * after that is rejected at the door. This is the shape a live
  * crawl-ingest pipeline needs (stop paying embedding/storage cost
  * for a domain the mix already has enough of) where the batch pass
  * shapes a corpus after the fact.
  *
  * Semantics difference from the batch pass, stated plainly: batch
  * ranks each domain by quality before applying the budget; a stream
  * cannot rank documents it has not seen, so admission is
  * arrival-order — first-come-first-served across micro-batches,
  * deterministic (ascending doc_id) within one. Re-running the same
  * batches replays the same admissions.
  *
  * Scale design: state is ONE long (tokens admitted) per domain —
  * bounded by domain cardinality, not stream length — and never times
  * out: a lifetime quota must survive quiet periods (state-store cost
  * of a long per domain is negligible). Per micro-batch, one domain's
  * documents are buffered to sort for determinism — bounded by the
  * batch, not the stream.
  */
object StreamingCuration {

  /** One candidate document. */
  final case class DocIn(domain: String, doc_id: Long, n_tokens: Long)

  /** One admitted document; `cum_tokens` is the domain's running
    * admitted total inclusive of this document.
    */
  final case class Admitted(domain: String, doc_id: Long, n_tokens: Long,
                            cum_tokens: Long)

  /** Admit documents while the per-domain running token total stays
    * within `maxTokens` (inclusive, matching the batch pass). Input
    * must carry (domain, doc_id, n_tokens). A document larger than
    * the remaining budget is rejected but does NOT close the domain —
    * a later smaller one may still fit (greedy, like the batch
    * prefix... except the stream can keep admitting past a reject;
    * the batch prefix stops. Both are stated contracts).
    */
  def admitWithBudget(docs: DataFrame, maxTokens: Long): Dataset[Admitted] = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("domain").cast("string").as("domain"),
        col("doc_id").cast("long").as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"))
      .as[DocIn]
      .groupByKey(_.domain)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, it: Iterator[DocIn], state) =>
          var used = state.getOption.getOrElse(0L)
          val out = ArrayBuffer.empty[Admitted]
          it.toArray.sortBy(_.doc_id).foreach { d =>
            if (d.n_tokens >= 0 && used + d.n_tokens <= maxTokens) {
              used += d.n_tokens
              out += Admitted(domain, d.doc_id, d.n_tokens, used)
            }
          }
          state.update(used)
          out.iterator
      }
  }
}
