package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TripletsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // label 0: ids 1,2,3 — 1 and 2 nearly parallel, 3 orthogonal-ish;
  // label 1: ids 10, 11; label 2: id 20 (singleton — no positive)
  private def corpus = Seq(
    (1L, Seq(1.0f, 0.0f, 0.1f), 0),
    (2L, Seq(0.9f, 0.0f, 0.1f), 0),
    (3L, Seq(0.0f, 1.0f, 0.0f), 0),
    (10L, Seq(0.0f, 0.0f, 1.0f), 1),
    (11L, Seq(0.1f, 0.0f, 0.9f), 1),
    (20L, Seq(1.0f, 1.0f, 1.0f), 2)
  ).toDF("vec_id", "embedding", "label")

  private def mined = Triplets.mine(corpus, col("vec_id"),
      col("embedding"), col("label"))
    .collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    .toMap

  test("positive is the nearest same-label neighbor") {
    val m = mined
    assert(m(1L)._2 == 2L && m(2L)._2 == 1L, s"near-parallel pair: $m")
    // id 3 is closest to whichever of 1/2 wins the cosine tie-break
    assert(Set(1L, 2L).contains(m(3L)._2))
    assert(m(10L)._2 == 11L && m(11L)._2 == 10L)
  }

  test("singleton labels mine no triplet; negatives are other-label") {
    val m = mined
    assert(!m.contains(20L), "singleton label cannot have a positive")
    m.foreach { case (anchor, (label, pos, negId, negLabel)) =>
      assert(negLabel != label, s"anchor $anchor negative shares its label")
      assert(negId != anchor && negId != pos)
    }
  }

  test("all anchors of one label share the negative (one draw per class)") {
    val m = mined
    val byLabel = m.values.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    byLabel.foreach { case (lbl, negs) =>
      assert(negs.size == 1, s"label $lbl has ${negs.size} distinct negatives")
    }
  }

  test("deterministic under repartitioning") {
    val a = mined
    val b = Triplets.mine(corpus.repartition(5), col("vec_id"),
        col("embedding"), col("label"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .toMap
    assert(a == b)
  }
}
