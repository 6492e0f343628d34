package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** k-center greedy: farthest-point semantics on a hand corpus, tie
  * determinism, corpora smaller than k, and the no-shuffle argmax plan.
  */
class CoresetSpec extends AnyFunSuite with SparkSpec {

  private def corpus(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("farthest-point traversal picks the geometric extremes in order") {
    // points on a line: 0, 1, 2, 10, 11 — seed = min id (at x=0),
    // then the far cluster (x=11 beats x=10 only on distance, not id),
    // then the gap point x=2's nearest-chosen distance (2) beats x=1
    // (1) and x=10 (1)
    val df = corpus(
      (1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(2f, 0f)),
      (4L, Seq(10f, 0f)), (5L, Seq(11f, 0f)))
    val got = Coreset.kCenterGreedy(df, col("vec_id"), col("embedding"), 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, 1L, 0.0), (2, 5L, 11.0), (3, 3L, 2.0)), s"$got")
  }

  test("distance ties break on ascending id") {
    // two points equidistant from the seed: lower id wins
    val df = corpus(
      (1L, Seq(0f, 0f)), (7L, Seq(3f, 0f)), (9L, Seq(-3f, 0f)))
    val got = Coreset.kCenterGreedy(df, col("vec_id"), col("embedding"), 2)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((1, 1L), (2, 7L)), s"$got")
  }

  test("k larger than the corpus stops at n selections; k=1 is the seed") {
    val df = corpus((5L, Seq(1f)), (6L, Seq(2f)))
    assert(Coreset.kCenterGreedy(df, col("vec_id"), col("embedding"), 10)
      .count() == 2L)
    val one = Coreset.kCenterGreedy(df, col("vec_id"), col("embedding"), 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(one == Seq((1, 5L, 0.0)))
  }

  test("duplicate points never crowd out distinct ones") {
    val df = corpus(
      (1L, Seq(0f)), (2L, Seq(0f)), (3L, Seq(0f)), (4L, Seq(5f)))
    val got = Coreset.kCenterGreedy(df, col("vec_id"), col("embedding"), 2)
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 4L), s"the distinct far point must be chosen: $got")
  }

  test("the per-round argmax is a reduction, not a shuffle-sort") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, Seq(i.toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    // probe the exact per-round plan shape the operator builds
    val state = df.select(col("vec_id").as("id"),
        col("embedding").cast("array<float>").as("e"))
      .withColumn("mind", round(graft.vector.Distance.l2(col("e"),
        typedLit(Seq(0f, 0f))), 4))
    val plan = state.where(!col("id").isInCollection(Set(0L)))
      .orderBy(desc("mind"), asc("id")).limit(1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"argmax must be a bounded reduction:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"no shuffle in the argmax:\n$plan")
  }
}
