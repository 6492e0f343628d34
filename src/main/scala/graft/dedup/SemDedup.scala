package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.vector.{Ann, VectorKernels}

/** SemDeDup — cluster-scoped semantic deduplication (Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", 2023). The scale trick that makes embedding dedup
  * tractable on a 100 TB corpus: dense cosine has no lossless
  * sub-quadratic threshold join ([[EmbeddingDedup]] class doc), so
  * SemDeDup first k-means-partitions the embedding space and only
  * compares WITHIN a cluster — quadratic work drops from N² to
  * Σ|cluster|² ≈ N²/nlist, and nlist is sized so clusters stay at a
  * target size (nlist ∝ N / targetClusterSize ⇒ per-cluster work is
  * constant and total work is LINEAR in N at fixed cluster size).
  *
  * Spark shape: cluster assignment is the same codegen
  * nearest-centroid map the IVF index uses ([[Ann.buildIvf]] — seeded
  * Lloyd's over a bounded driver sample, deterministic); the
  * within-cluster pairing is ONE equi-join on `cluster_id` (shuffle
  * both sides by cluster, never an all-pairs broadcast), and the
  * keep/drop decision is a pairwise-local rule (no connected
  * components needed), so the whole pass is join + filter + anti-join
  * — every stage a plain Catalyst operator.
  *
  * Exactness gate: with `nlist = 1` the cluster partition is trivial
  * and within-cluster == global, so the operator degrades to the exact
  * tier and the DuckDB oracle can replay it verbatim
  * (`dedup_semantic_keep`) — same "degradation dial made exact" trick
  * as the IVF full-probe and PQ full-codebook gates. The clustered
  * route (`nlist > 1`) is recall-approximate by design (cross-cluster
  * near-dups are unseen); SemDedupSpec pins pairs ⊆ exact pairs,
  * single-cluster == exact equality, and partitioning invariance.
  */
object SemDedup {

  /** Keep-policy for [[semanticKeep]]: which member of a near-dup
    * neighborhood survives.
    *
    *  - [[KeepLowestId]] — deterministic, engine-portable (the oracle
    *    policy): a row is dropped iff ANY lower-id same-cluster
    *    neighbor clears the threshold.
    *  - [[KeepFarthestFromCentroid]] — the paper's policy (§3: "keep
    *    the example with the lowest cosine similarity to the cluster
    *    centroid", i.e. prefer boundary examples, drop prototypical
    *    duplicates); id breaks exact centroid-similarity ties.
    */
  sealed trait KeepPolicy
  case object KeepLowestId extends KeepPolicy
  case object KeepFarthestFromCentroid extends KeepPolicy

  /** Corpus with `cluster_id` attached: seeded k-means over a bounded
    * driver-side sample, then the codegen nearest-centroid map — the
    * identical machinery (and determinism contract) of the IVF coarse
    * quantizer. Output columns: (id, emb, cluster_id).
    */
  def assignClusters(df: DataFrame, idCol: Column, embCol: Column,
                     nlist: Int, seed: Long = 42L,
                     maxTrainRows: Int = 100000): Ann.IvfIndex = {
    val base = df.select(idCol.cast("long").as("id"), embCol.as("embedding"))
      .where(col("id").isNotNull && col("embedding").isNotNull)
    Ann.buildIvf(base, "embedding", nlist, seed, maxTrainRows = maxTrainRows)
  }

  private def cos4(a: Column, b: Column): Column =
    round(VectorKernels.cosine(a, b), 4)

  /** Within-cluster near-dup pairs (id_a < id_b, 4dp-rounded cosine ≥
    * threshold, same cluster). ONE equi-join on `cluster_id`: both
    * sides shuffle by cluster and each task walks only its clusters'
    * cross products — per-task memory is the largest single cluster
    * (bounded by construction when nlist tracks corpus size), and no
    * side is ever broadcast. Output ⊆ [[EmbeddingDedup.cosinePairs]]
    * output for any nlist; equal at nlist = 1.
    */
  def semanticPairs(index: Ann.IvfIndex, minCosine: Double): DataFrame = {
    val assigned = index.assigned
      .select(col("id"), col("embedding").as("emb"), col("cluster_id"))
      .repartition(col("cluster_id"))
    // `id_a < id_b` FIRST in the conjunction: evaluation order is
    // condition order, so the fused cosine kernel prices N²/2 ordered
    // pairs per cluster, not all N²
    assigned.as("l")
      .join(assigned.as("r"),
        col("l.cluster_id") === col("r.cluster_id") &&
          col("l.id") < col("r.id") &&
          cos4(col("l.emb"), col("r.emb")) >= minCosine)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        cos4(col("l.emb"), col("r.emb")).as("cosine"),
        col("l.cluster_id").as("cluster_id"))
  }

  /** Keep/drop verdict per document: (id, cluster_id, is_keeper). A
    * document is dropped iff some same-cluster neighbor above the
    * threshold precedes it under the policy's total order — a
    * pairwise-LOCAL rule: at least one member of every near-dup
    * neighborhood survives (its minimum), no connected components and
    * no cross-cluster state. Implemented as the pair join above
    * reduced to a drop-set, then a broadcast-free anti-join back onto
    * the corpus.
    */
  def semanticKeep(index: Ann.IvfIndex, minCosine: Double,
                   policy: KeepPolicy = KeepLowestId): DataFrame = {
    val assigned = index.assigned
      .select(col("id"), col("embedding").as("emb"), col("cluster_id"))
      .repartition(col("cluster_id"))
    val ranked = policy match {
      case KeepLowestId => assigned.withColumn("rank_key", col("id").cast("double"))
      case KeepFarthestFromCentroid =>
        // centroid table is nlist rows — broadcast by size, never corpus
        val spark = assigned.sparkSession
        import spark.implicits._
        val cents = index.centroids.zipWithIndex
          .map { case (c, i) => (i, c.map(_.toFloat)) }.toSeq
          .toDF("cluster_id", "centroid")
        assigned.join(broadcast(cents), "cluster_id")
          .withColumn("rank_key", cos4(col("emb"), col("centroid")))
          .drop("centroid")
    }
    // drop x ⇔ ∃ same-cluster y: cos(x,y) ≥ τ ∧ (rank(y), y.id) < (rank(x), x.id)
    val drops = ranked.as("l")
      .join(ranked.as("r"),
        col("l.cluster_id") === col("r.cluster_id") &&
          col("l.id") =!= col("r.id") &&
          (col("r.rank_key") < col("l.rank_key") ||
            (col("r.rank_key") === col("l.rank_key") && col("r.id") < col("l.id"))) &&
          cos4(col("l.emb"), col("r.emb")) >= minCosine)
      .select(col("l.id").as("id")).distinct()
    ranked.select(col("id"), col("cluster_id"))
      .join(drops.withColumn("dropped", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster_id"),
        coalesce(!col("dropped"), lit(true)).as("is_keeper"))
  }

  /** DuckDB twin of the nlist = 1 [[semanticKeep]] under
    * [[KeepLowestId]] (single cluster ⇒ within-cluster == global, and
    * the drop rule reduces to "some LOWER-id row clears the
    * threshold"). Emits (id, is_keeper) — cluster_id is the trained
    * label, meaningless to replay in SQL, so the Spark query projects
    * it away too.
    */
  def semanticKeepSql(table: String, idExpr: String, embExpr: String,
                      minCosine: Double): String =
    s"""SELECT v.$idExpr AS id,
       | NOT EXISTS (
       |  SELECT 1 FROM $table o
       |  WHERE o.$idExpr < v.$idExpr
       |   AND ${graft.oracle.Sql.cosine(s"o.$embExpr", s"v.$embExpr")} >= $minCosine
       | ) AS is_keeper
       |FROM $table v""".stripMargin
}
