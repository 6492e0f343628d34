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

  /** Stream a single-`h`-LongType-column frame's values to the driver
    * in ONE Spark job: each partition reduces to a primitive long
    * array executor-side and `handle` consumes the arrays on the
    * driver as tasks complete (the scheduler delivers results
    * serially). `toLocalIterator` — the previous shape at both call
    * sites — submits one job PER PARTITION; over a post-shuffle frame
    * that is `spark.sql.shuffle.partitions` sequential driver
    * round-trips per micro-batch, pure per-job fixed cost (measured:
    * the registry gates spend ~half their wall time driver-side
    * across ~25 small jobs per batch). Memory contract is unchanged:
    * only the 8-byte hashes move, the driver holds per-partition
    * primitive arrays transiently, and the driver-held filter is
    * never serialized anywhere.
    */
  private[graft] def longsToDriver(hashes: DataFrame)
                                  (handle: Array[Long] => Unit): Unit = {
    val df = hashes.select(col("h"))
    val rdd = df.queryExecution.toRdd
    df.sparkSession.sparkContext.runJob(
      rdd,
      (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        while (it.hasNext) buf += it.next().getLong(0)
        buf.result()
      },
      (_: Int, arr: Array[Long]) => handle(arr))
  }

  /** Driver-side probe: stream the batch's 8-byte seed hashes to the
    * driver ([[longsToDriver]] — O(batch), one job) and test each
    * against a driver-held filter. The filter — which scales with
    * registry cardinality — is never serialized anywhere; only the
    * hashes move. Stops ACCUMULATING once the positive set exceeds
    * [[Spans.ScreenPushLimit]] (the caller then runs the exact path);
    * the observable result is order-independent — below the limit
    * every positive is collected, past it the caller discards the
    * over-limit array either way.
    */
  def fromDriverProbe(mightContain: Long => Boolean): SeedScreen =
    new SeedScreen {
      def positives(seedHashes: DataFrame): Array[Long] = {
        val out = scala.collection.mutable.SortedSet.empty[Long]
        longsToDriver(seedHashes) { arr =>
          var i = 0
          while (out.size <= Spans.ScreenPushLimit && i < arr.length) {
            val h = arr(i)
            if (mightContain(h)) out += h
            i += 1
          }
        }
        out.toArray
      }
    }
}
