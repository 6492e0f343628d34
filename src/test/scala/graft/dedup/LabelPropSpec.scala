package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LabelPropSpec extends AnyFunSuite with SparkSpec {

  test("barbell graph: two triangles keep distinct communities; CC merges them") {
    import spark.implicits._
    val nodes = (1L to 7L).toDF("id") // 7 is isolated
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),   // triangle A
      (4L, 5L), (4L, 6L), (5L, 6L),   // triangle B
      (3L, 4L)                         // weak bridge
    ).toDF("id_a", "id_b")
    val lp = LabelProp.labelPropagation(nodes, edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within-triangle agreement
    assert(lp(1L) == lp(2L) && lp(2L) == lp(3L))
    assert(lp(4L) == lp(5L) && lp(5L) == lp(6L))
    // the bridge does NOT merge the communities (CC would)
    assert(lp(1L) != lp(4L), s"communities must stay distinct: $lp")
    val cc = Components.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).map(cc).toSet.size == 1, "CC merges across the bridge")
    // isolated node keeps its own id in both views
    assert(lp(7L) == 7L && cc(7L) == 7L)
  }

  test("distributed rounds equal a local reference vote on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for (_ <- 1 to 60) yield {
      val a = 1L + rnd.nextInt(n); val b = 1L + rnd.nextInt(n)
      if (a < b) Some((a, b)) else if (b < a) Some((b, a)) else None
    }).flatten.distinct
    val nodes = (1L to n.toLong)
    // local replica of the contract: Jacobi rounds, majority vote,
    // min-label ties, isolated nodes keep their label
    val adj = nodes.map(v => v -> (edges.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    })).toMap
    var lbl = nodes.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = nodes.map { v =>
        val votes = adj(v).map(lbl)
        if (votes.isEmpty) v -> lbl(v)
        else {
          val counts = votes.groupBy(identity).view.mapValues(_.size)
          v -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }.toMap
    }
    val got = LabelProp.labelPropagation(nodes.toDF("id"),
        edges.toDF("id_a", "id_b"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lbl, s"distributed != local reference:\n$got\nvs\n$lbl")
  }

  test("tie-break is minimum label and rounds are exactly replayed") {
    import spark.implicits._
    // star: center 10 with leaves 1, 2, 3 — all leaf votes tie at 1
    val nodes = Seq(1L, 2L, 3L, 10L).toDF("id")
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("id_a", "id_b")
    val r1 = LabelProp.labelPropagation(nodes, edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // center takes min leaf label; each leaf takes the center's label
    assert(r1 == Map(1L -> 10L, 2L -> 10L, 3L -> 10L, 10L -> 1L))
    val r2 = LabelProp.labelPropagation(nodes, edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 2 re-votes from round-1 labels: leaves all carry 10 → the
    // center's majority is 10; leaves see the center's 1
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L))
  }
}
