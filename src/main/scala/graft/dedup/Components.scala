package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step
  * every dedup pipeline needs AFTER pair generation: pairs chain
  * (A≈B, B≈C but A̸≈C), so "drop one of each pair" over-deletes and
  * under-deletes; the correct unit of deletion is the component, with
  * one keeper per component (the reference has no dedup at all; this
  * is the §2.7 extension surface).
  *
  * Algorithm: minimum-label propagation (the dataframe form of
  * small-star — cf. the MapReduce connected-components literature):
  * every node starts labeled with its own id; each round every node
  * takes the min label over itself and its neighbors; converged when
  * no label changes. Rounds = graph diameter, and each round is one
  * hash-join + partial-aggregation pass — no driver-side graph, no
  * vertex state beyond (node, label), so the pass scales like any
  * other aggregation. Near-dup graphs are clique-ish (diameter 1-3),
  * so in practice 2-4 rounds; `maxIters` bounds pathological chains,
  * and hitting it raises rather than silently emitting a partial
  * clustering.
  */
object Components {

  /** Connected components of the undirected graph given by `edges`
    * (columns `id_a`, `id_b`). Returns (id, component) where
    * `component` is the minimum node id reachable. Nodes outside any
    * edge are their own components only if present in `nodes` (pass
    * the full corpus ids to include singletons).
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    // localCheckpoint per round: an iterative dataframe loop otherwise
    // DOUBLES its logical plan every round (labels appears in both the
    // join and the convergence check) — planning itself OOMs long
    // before the data does. Checkpointing truncates lineage to the
    // materialized partitions, keeping round N's plan size constant.
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    // superseded checkpoints must be dropped as we go: each round's
    // blocks otherwise stay in the block manager for the session's
    // lifetime (storage leak ∝ rounds × labels), starving later jobs
    var retired = List.empty[DataFrame]
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // each node adopts the min label among itself and its neighbors;
      // the `changed` flag rides along so convergence is a count over
      // the already-materialized checkpoint, not an extra join
      val fromNeighbors = sym
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("component", "n_component"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("n_component").as("n_component"))
      val next = labels.join(fromNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("component"),
            coalesce(col("n_component"), col("component"))).as("component"),
          (col("n_component") < col("component")).as("changed"))
        .localCheckpoint()
      converged = next.where(col("changed")).isEmpty
      // next is materialized (localCheckpoint is eager); the previous
      // round's blocks can go now
      retired.foreach(org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint)
      retired = List(labels)
      labels = next.select("id", "component")
      it += 1
    }
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(sym)
    retired.foreach(org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          "(graph diameter exceeds the bound); raise maxIters")
    // the returned frame is backed by the FINAL round's checkpoint
    // only — bounded, and still readable by the caller
    labels
  }

  /** End-to-end duplicate-cluster collapse: near-dup pairs → connected
    * components → one keeper (min id) per component. Emits every
    * clustered document with its cluster id and keeper flag; singleton
    * documents (no near-dup) are omitted — they are all keepers.
    */
  def dupClusters(corpus: DataFrame, idCol: Column, textCol: Column,
                  minJaccard: Double = 0.5): DataFrame = {
    val edges = Dedup.ngramJaccardPairsPrefix(corpus, idCol, textCol,
      minJaccard = minJaccard)
    val nodes = edges.select(col("id_a").as("id"))
      .unionAll(edges.select(col("id_b").as("id"))).distinct()
    connectedComponents(nodes, edges)
      .select(col("id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("is_keeper"))
  }
}
