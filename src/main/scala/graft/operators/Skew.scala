package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the hand-rolled counterpart to
  * AQE's runtime skew splitting (OptimizeSkewedJoin), for when the
  * skew is KNOWN ahead of time and the plan should never build a hot
  * partition in the first place (AQE can only split a skewed partition
  * after the map stage has materialized it; salting spreads the hot
  * key across reducers from the start and also covers aggregations,
  * which AQE's skew handling does not).
  *
  * Contract: equi-join `left ⋈ right` on `key`, where `left` is large
  * and skewed and `right` is too large to broadcast but small enough
  * to replicate `salts`-fold. Each left row picks ONE deterministic
  * pseudo-random salt (a content hash, never rand() — retried tasks
  * must re-derive the same salt); each right row is replicated under
  * ALL salts. The join key becomes (key, salt), so a key carrying p%
  * of the rows spreads over `salts` reducers instead of one.
  */
object Skew {

  /** Inner equi-join with a salted key. `leftSaltSrc` must be a
    * deterministic per-row expression (e.g. a unique id) — it seeds
    * the salt via xxhash64, so reruns and retries salt identically.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftSaltSrc: Column, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    // withColumn REPLACES silently — a pre-existing __salt on either
    // side would corrupt the join key rather than error
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin reserves column name __salt; rename it on the inputs")
    val l = left.withColumn("__salt", pmod(xxhash64(leftSaltSrc), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
