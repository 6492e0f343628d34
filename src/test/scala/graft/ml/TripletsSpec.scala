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

  test("LSH route: exact recovery on planted near-duplicates") {
    // each planted ×2 copy has cosine exactly 1.0 with its original
    // and identical hyperplane signs — every band collides, so the
    // copy IS the mined positive, deterministically
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding"), col("label"))
    val planted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
        .as("embedding"), col("label"))
    val out = Triplets.mineLsh(emb.unionAll(planted), col("vec_id"),
        col("embedding"), col("label"), dim = 64, bands = 8, bits = 16)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    emb.select("vec_id").collect().map(_.getLong(0)).foreach { id =>
      assert(out(id) == (id + 1000000L, 1.0),
        s"anchor $id did not mine its planted copy: ${out(id)}")
      assert(out(id + 1000000L) == (id, 1.0))
    }
  }

  test("hard negatives are the nearest other-label vector") {
    val m = Triplets.mineHard(corpus, col("vec_id"), col("embedding"),
        col("label"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getDouble(6))).toMap
    // anchor 10 = (0,0,1): nearest other-label is 20 (1,1,1) at
    // cos = 1/√3 ≈ 0.5774 — beats 1 (0.0995) and 2 (0.1104) and 3 (0)
    assert(m(10L)._3 == 20L, s"got ${m(10L)}")
    m.foreach { case (anchor, (label, _, negId, negLabel, negSim)) =>
      assert(negLabel != label)
      // hard negative must be at least as near as the easy draw
      val easy = mined(anchor)._3
      if (easy != negId) assert(negSim >= -1.0)
    }
    // singleton label 2 still mines no row (no positive)
    assert(!m.contains(20L))
  }

  test("hard-LSH route: similarities never beat the exact route; rows genuine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
    val exact = Triplets.mineHard(emb, col("vec_id"), col("embedding"),
        col("label")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(6))).toMap
    val labels = emb.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lsh = Triplets.mineHardLsh(emb, col("vec_id"), col("embedding"),
        col("label"), dim = 64, bands = 8, bits = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(lsh.nonEmpty)
    lsh.foreach { case (a, (label, posId, posSim, negId, negLabel, negSim)) =>
      val (ePos, eNeg) = exact(a)
      assert(posSim <= ePos + 1e-12, s"anchor $a: LSH pos $posSim beats $ePos")
      assert(negSim <= eNeg + 1e-12, s"anchor $a: LSH neg $negSim beats $eNeg")
      assert(labels(posId) == label, s"anchor $a positive crosses labels")
      assert(labels(negId) == negLabel && negLabel != label,
        s"anchor $a negative is not other-label")
    }
  }

  test("hard-LSH route: planted near-miss negatives are recovered") {
    // each planted ×4 copy under a DIFFERENT label is its original's
    // true hardest negative (cosine exactly 1.0) and shares every
    // hyperplane sign — all bands collide, recovery is deterministic.
    // Same-label ×2 copies ride along so every anchor also has a
    // deterministic positive (rows need both sides, like mineHard)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
        col("label").cast("long").as("label"))
    val same = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
        .as("embedding"), col("label"))
    val cross = emb.select((col("vec_id") + 2000000L).as("vec_id"),
      transform(col("embedding"), x => (x * lit(4.0f)).cast("float"))
        .as("embedding"), (col("label") + 1000L).as("label"))
    val out = Triplets.mineHardLsh(emb.unionAll(same).unionAll(cross),
        col("vec_id"), col("embedding"), col("label"),
        dim = 64, bands = 8, bits = 16)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4), r.getDouble(6)))
      .toMap
    emb.select("vec_id").collect().map(_.getLong(0)).foreach { id =>
      val (posId, negId, negSim) = out(id)
      assert(posId == id + 1000000L && negId == id + 2000000L && negSim == 1.0,
        s"anchor $id did not mine its planted copies: ${out(id)}")
    }
  }

  test("hard-LSH plan has no cross-label NLJ or cartesian product") {
    val plan = Triplets.mineHardLsh(corpus, col("vec_id"), col("embedding"),
        col("label"), dim = 3, bands = 4, bits = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("LSH positives never beat the exact route's similarity") {
    val exact = mined
    val lsh = Triplets.mineLsh(corpus, col("vec_id"), col("embedding"),
        col("label"), dim = 3, bands = 16, bits = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toMap
    val exactSim = Triplets.mine(corpus, col("vec_id"), col("embedding"),
        col("label")).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    lsh.foreach { case (anchor, (label, pos, sim, negId)) =>
      assert(sim <= exactSim(anchor) + 1e-12,
        s"anchor $anchor: LSH sim $sim beats exact ${exactSim(anchor)}")
      assert(exact(anchor)._1 == label)
      assert(exact(anchor)._3 == negId, "negatives must match the exact route")
      assert(pos != anchor)
    }
  }
}
