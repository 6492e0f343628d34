package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Membership screen over a gram registry's 8-byte hashes, probed once
  * per micro-batch by [[Spans.clipSpansPrefixStep]] with the BATCH's
  * seed hashes. Contract: [[positives]] returns a SUPERSET of the seed
  * hashes actually present in the registry (no false negatives — a
  * miss would silently under-clip), bounded by true hits + fpp × batch
  * seeds, NEVER by registry size. The step pushes the returned set
  * into the registry scan as `h IN (…)` (empty set ⇒ the scan is
  * skipped entirely), so per-batch cost tracks the batch's hits, not
  * stream lifetime.
  *
  * Implementations: [[SeedScreen.fromDriverProbe]] wraps a driver-held
  * Bloom filter (the whole-registry screen, or the small TAIL screen
  * of [[graft.streaming.BucketScreen]]'s two-tier form, whose bucket
  * blooms are probed on executors instead).
  */
trait SeedScreen {

  /** Distinct screen-positive hashes among `seedHashes` (single `h`
    * LongType column; may contain duplicates). Capped by the caller at
    * [[Spans.ScreenPushLimit]] — return any array LONGER than the
    * limit to signal "stop screening, run the exact path" (the step
    * never reads past the limit, so implementations may early-exit).
    */
  def positives(seedHashes: DataFrame): Array[Long]
}

object SeedScreen {

  /** Driver-side probe: stream the batch's 8-byte seed hashes to the
    * driver (`toLocalIterator` — O(batch), partition at a time) and
    * test each against a driver-held filter. The filter — which scales
    * with registry cardinality — is never serialized anywhere; only
    * the hashes move. Early-exits once the positive set exceeds
    * [[Spans.ScreenPushLimit]] (the caller then runs the exact path).
    */
  def fromDriverProbe(mightContain: Long => Boolean): SeedScreen =
    new SeedScreen {
      def positives(seedHashes: DataFrame): Array[Long] = {
        import scala.jdk.CollectionConverters._
        val out = scala.collection.mutable.SortedSet.empty[Long]
        val it = seedHashes.select(col("h")).toLocalIterator().asScala
        while (it.hasNext && out.size <= Spans.ScreenPushLimit) {
          val h = it.next().getLong(0)
          if (mightContain(h)) out += h
        }
        out.toArray
      }
    }
}
