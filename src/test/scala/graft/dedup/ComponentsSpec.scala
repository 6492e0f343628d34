package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ComponentsSpec extends AnyFunSuite with SparkSpec {

  // localEdgeLimit = -1 forces the distributed propagation loop;
  // Long.MaxValue forces the driver union-find route
  private def cc(edges: Seq[(Long, Long)], nodes: Seq[Long],
                 localEdgeLimit: Long = 2000000L): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(
        nodes.toDF("id"), edges.toDF("id_a", "id_b"),
        localEdgeLimit = localEdgeLimit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains, cliques and singletons resolve to min-id components") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),   // a 4-chain
      (10L, 11L), (10L, 12L), (11L, 12L))           // a triangle
    val labels = cc(edges, Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("a long path needs diameter rounds and still converges (distributed route)") {
    val n = 15
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong))
    val labels = cc(edges, (1 to n).map(_.toLong), localEdgeLimit = -1L)
    assert(labels.values.toSet == Set(1L))
  }

  test("both routes agree on chains + cliques + singletons + stars") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (50L, 60L), (50L, 70L), (50L, 80L), (7L, 4L))
    val nodes = (edges.flatMap(e => Seq(e._1, e._2)) ++ Seq(99L, 100L)).distinct
    val dist = cc(edges, nodes, localEdgeLimit = -1L)
    val local = cc(edges, nodes, localEdgeLimit = Long.MaxValue)
    assert(dist == local, s"distributed $dist != local $local")
  }

  test("both routes propagate through edge endpoints absent from nodes") {
    // node 2 links 1 and 3 but is not in the output vertex set: both
    // routes must still connect 1-3, and neither may emit node 2
    val edges = Seq((1L, 2L), (2L, 3L))
    val nodes = Seq(1L, 3L)
    val dist = cc(edges, nodes, localEdgeLimit = -1L)
    val local = cc(edges, nodes, localEdgeLimit = Long.MaxValue)
    assert(dist == Map(1L -> 1L, 3L -> 1L), s"distributed: $dist")
    assert(local == Map(1L -> 1L, 3L -> 1L), s"local: $local")
  }

  test("non-convergence within maxIters raises instead of emitting partial clusters") {
    import spark.implicits._
    val edges = (1 until 10).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val nodes = (1 to 10).map(_.toLong).toDF("id")
    intercept[IllegalStateException] {
      Components.connectedComponents(nodes, edges, maxIters = 2,
        localEdgeLimit = -1L).collect()
    }
  }

  test("superseded per-round checkpoints are unpersisted (no storage leak)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    // 15-node path → many propagation rounds → many retired checkpoints
    val edges = (1 until 15).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val nodes = (1 to 15).map(_.toLong).toDF("id")
    Components.connectedComponents(nodes, edges, localEdgeLimit = -1L).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    // only the FINAL round's checkpoint (the returned frame's backing
    // blocks) may remain
    assert(leaked <= 1, s"$leaked checkpointed RDDs left cached; expected <= 1")
  }

  test("local route leaves no cached blocks behind") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1 until 15).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val nodes = (1 to 15).map(_.toLong).toDF("id")
    Components.connectedComponents(nodes, edges,
      localEdgeLimit = Long.MaxValue).collect()
    // upper bound, not equality: unpersists are async (blocking=false),
    // so blocks pending removal from EARLIER tests may disappear
    // between the two counts — the local route must only add nothing
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("incrementalComponents equals full recompute: merges, attaches, new clusters") {
    import spark.implicits._
    // old graph: {1,2,3} and {10,11}; 20 isolated via self-edge-free node
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val oldNodes = Seq(1L, 2L, 3L, 10L, 11L, 20L)
    val prev = Components.connectedComponents(
      oldNodes.toDF("id"), oldEdges.toDF("id_a", "id_b"))
    // delta: merge the two clusters via 3-10, attach new node 30 to 20,
    // and a brand-new cluster {40,41}
    val delta = Seq((3L, 10L), (30L, 20L), (40L, 41L)).toDF("id_a", "id_b")
    val inc = Components.incrementalComponents(prev, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = cc(oldEdges ++ Seq((3L, 10L), (30L, 20L), (40L, 41L)),
      oldNodes ++ Seq(30L, 40L, 41L))
    assert(inc == full, s"incremental $inc != full $full")
  }

  test("incrementalComponents with an empty or no-op delta is identity") {
    import spark.implicits._
    val prev = Components.connectedComponents(
      Seq(1L, 2L, 3L).toDF("id"), Seq((1L, 2L)).toDF("id_a", "id_b"))
    // a delta edge entirely inside an existing component changes nothing
    val noop = Components.incrementalComponents(prev, Seq((2L, 1L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noop == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    val empty = Components.incrementalComponents(prev,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(empty == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("dupClusters: planted dup classes collapse to one keeper each") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),     // dup of 1
      (3L, "alpha beta gamma delta zeta"),        // near-dup of 1/2
      (4L, "totally different content here now"),
      (5L, "another unrelated document text")
    ).toDF("id", "text")
    val out = Components.dupClusters(docs, col("id"), col("text"), minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, 1L, true), (2L, 1L, false), (3L, 1L, false)))
  }

  test("keeperByScore picks the best member; constant scores reduce to min id") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 10L), (2L, 50L), (3L, 50L), (7L, 5L), (9L, 5L))
      .toDF("id", "score")
    val out = Components.keeperByScore(clusters, scores)
      .orderBy("cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cluster 1: 2 and 3 tie at 50 -> lowest id (2) wins;
    // cluster 7: constant scores -> min id, the dupClusters convention
    assert(out.toSeq == Seq((1L, 2L, 50L, 3L), (7L, 7L, 5L, 2L)))
    val plan = Components.keeperByScore(clusters, scores)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"one aggregate, no window:\n$plan")
  }
}
