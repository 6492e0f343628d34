package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy hitters — frequent-term detection whose state is
  * BOUNDED AT `capacity` ENTRIES no matter the corpus: the summary a
  * 100 TB frequency scan can actually hold per task, where an exact
  * `groupBy(term).count` must shuffle every distinct term. The
  * classic guarantee (Misra & Gries 1982; merge rule per Agarwal et
  * al. 2013): reported count ∈ [true − n/(capacity+1), true], and any
  * term with true count > n/(capacity+1) is guaranteed present.
  *
  * Spark shape: a typed [[Aggregator]] — partial summaries build
  * map-side (bounded), merge associatively on the reduce side, so the
  * whole pass is one partial-aggregate exchange of ≤ capacity rows
  * per task, never a corpus-wide term shuffle.
  *
  * Exactness gate: decrements only happen past capacity, so with
  * `capacity ≥ distinct-term count` the summary IS the exact
  * frequency table regardless of partitioning or merge order — that
  * configuration sits under the DuckDB `GROUP BY count` oracle
  * (`q_heavy_hitters_exact`), the same degradation-dial trick as the
  * IVF full-probe gate. Under-capacity behavior (the approximate
  * production mode) is spec-bounded instead: counts depend on merge
  * order there, the ERROR BOUND does not.
  */
object HeavyHitters {

  /** Bounded summary + total processed count (for the error bound). */
  final case class Summary(counts: mutable.HashMap[String, Long],
                           var processed: Long)

  final case class Hit(term: String, count: Long, max_undercount: Long)

  class MisraGries(capacity: Int)
      extends Aggregator[String, Summary, Seq[Hit]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Summary = Summary(mutable.HashMap.empty, 0L)

    /** Shrink to ≤ capacity entries: subtract the (capacity+1)-largest
      * count from everything and drop the non-positive — the batched
      * decrement; entries removed this way had counts ≤ the pivot,
      * which is exactly the undercount the bound charges.
      */
    private def shrink(b: Summary): Summary = {
      if (b.counts.size > capacity) {
        val pivot = b.counts.values.toArray.sortBy(-_).apply(capacity)
        val dead = mutable.ArrayBuffer.empty[String]
        b.counts.keysIterator.foreach { k =>
          val nv = b.counts(k) - pivot
          if (nv <= 0) dead += k else b.counts(k) = nv
        }
        dead.foreach(b.counts.remove)
      }
      b
    }

    override def reduce(b: Summary, term: String): Summary = {
      b.counts(term) = b.counts.getOrElse(term, 0L) + 1L
      b.processed += 1L
      shrink(b)
    }

    override def merge(b1: Summary, b2: Summary): Summary = {
      b2.counts.foreach { case (k, v) =>
        b1.counts(k) = b1.counts.getOrElse(k, 0L) + v
      }
      b1.processed += b2.processed
      shrink(b1)
    }

    override def finish(b: Summary): Seq[Hit] = {
      val bound = b.processed / (capacity + 1L)
      b.counts.toSeq.sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => Hit(t, c, bound) }
    }

    // Java serialization, not Kryo: chill's FieldSerializer cannot build
    // a serializer for the 2.13 HashMap's internal graph (it dies on a
    // HeapByteBuffer reachable through the default-serializer path) —
    // and the buffer crosses the wire at most once per task at ≤
    // capacity entries, so the encoder is not a hot path.
    override def bufferEncoder: Encoder[Summary] =
      Encoders.javaSerialization[Summary]
    override def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Run the summary over a term dataset; returns (term, count,
    * max_undercount) rows sorted by (count desc, term).
    */
  def summarize(terms: Dataset[String], capacity: Int): Dataset[Hit] = {
    val spark = terms.sparkSession
    import spark.implicits._
    terms.select(new MisraGries(capacity).toColumn).flatMap(identity(_))
  }

  /** Per-group hit row. */
  final case class GroupedHit(group: String, term: String, count: Long,
                              max_undercount: Long)

  /** PER-GROUP Misra-Gries — the grouped sibling (per-domain /
    * per-language frequent terms, the shape curation screens consume):
    * one bounded summary per key via `groupByKey(...).agg`, so state is
    * groups × ≤ capacity entries and the per-group guarantee is
    * unchanged (each group runs its own independent summary — the
    * error bound uses the GROUP's processed count, not the corpus's).
    * Same exactness dial: capacity ≥ a group's distinct-term count
    * makes that group's summary its exact frequency table, which is
    * how the oracle gates it.
    */
  def summarizeBy(terms: Dataset[(String, String)],
                  capacity: Int): Dataset[GroupedHit] = {
    val spark = terms.sparkSession
    import spark.implicits._
    terms.groupByKey(_._1).mapValues(_._2)
      .agg(new MisraGries(capacity).toColumn)
      .flatMap { case (g, hits) =>
        hits.map(h => GroupedHit(g, h.term, h.count, h.max_undercount))
      }
  }
}
