package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.oracle.Sql
import graft.vector.VectorKernels

/** Contrastive-training triplet mining over an embedding corpus
  * (triplet losses and (semi-)hard negative selection per Schroff et
  * al. 2015, FaceNet) —
  * the dataset-preparation step for embedding-model training
  * ((anchor, positive, negative) rows for triplet/InfoNCE losses),
  * fully deterministic so the mined set is reproducible and
  * oracle-checkable:
  *
  *  - positive: the anchor's nearest SAME-label neighbor (4dp-rounded
  *    cosine, ties by ascending candidate id — the [[graft.vector]]
  *    determinism contract);
  *  - negative: hard determinism without hard-negative cost — the
  *    minimum-sha256 vector among OTHER-label classes. One fixed
  *    pseudo-random draw per anchor label, shared by all anchors of
  *    that label: negatives need decorrelation from the anchor, not
  *    per-anchor search (per-anchor hash-min would be another M×N
  *    pass for no training benefit).
  *
  * Scale shape: positives pair WITHIN label partitions — one label
  * equi-join, per-task memory bounded by the label group (swap the
  * pair join for the IVF/blocked routes in [[graft.vector]] when a
  * single class outgrows a task). The negative table is
  * |labels|-sized: per-label hash-min via one aggregation, then each
  * label's negative = the global hash-min among OTHER labels,
  * resolved from the top-2 label minima (labels-sized window, no
  * second corpus pass). Output is one row per anchor.
  */
object Triplets {

  private def negHash(idCol: Column): Column =
    sha2(concat(lit("neg"), idCol.cast("string")), 256)

  private def negHashSql(idExpr: String): String =
    s"sha256('neg' || CAST($idExpr AS VARCHAR))"

  private def prep(df: DataFrame, idCol: Column, embCol: Column,
                   labelCol: Column): DataFrame =
    df.select(idCol.cast("long").as("id"),
        embCol.cast("array<float>").as("emb"),
        labelCol.cast("long").as("label"))
      .where(col("id").isNotNull && col("emb").isNotNull)

  /** Per-label negatives: each label's negative = the global hash-min
    * vector among OTHER labels, resolved from the top-2 label minima —
    * a labels-sized table, no corpus pass beyond one aggregation.
    */
  private def negativesFor(base: DataFrame): DataFrame = {
    val wLbl = Window.partitionBy(col("label"))
      .orderBy(negHash(col("id")).asc, col("id").asc)
    val labelMins = base
      .withColumn("__rn", row_number().over(wLbl))
      .where(col("__rn") === 1)
      .select(col("label").as("neg_label"), col("id").as("neg_id"),
        negHash(col("id")).as("__h"))
    val wAll = Window.orderBy(col("__h").asc, col("neg_id").asc)
    val top2 = labelMins.withColumn("__r", row_number().over(wAll))
      .where(col("__r") <= 2)
    labelMins.select(col("neg_label").as("label")).as("l")
      .join(broadcast(top2).as("t"),
        col("l.label") =!= col("t.neg_label"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("l.label")).orderBy(col("t.__r").asc)))
      .where(col("__rn") === 1)
      .select(col("l.label").as("label"), col("t.neg_id").as("neg_id"),
        col("t.neg_label").as("neg_label"))
  }

  /** Per-anchor positive argmax (sim desc, ties by ascending cand) as
    * `max(struct(sim, -cand))` — a partial aggregation with map-side
    * combine, so the exchange carries at most one row per (anchor,
    * partition) where a window `row_number` would shuffle-and-sort the
    * FULL pair set (the pair set is the quadratic object here; the
    * argmax must collapse it before the wire). Negated cand makes the
    * struct max pick the LOWEST candidate id on equal sims — the same
    * order the windows used. NaN sims rank above all numbers under
    * both `max` and `desc` ordering, so the winner is identical.
    */
  private def bestPos(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("anchor"), col("label"))
      .agg(max(struct(col("sim"), (-col("cand")).as("__nc"))).as("__m"))
      .select(col("anchor"), col("label"),
        (-col("__m.__nc")).as("pos_id"), col("__m.sim").as("pos_sim"))

  /** [[bestPos]] for the hard-negative side: payload `neg_label` rides
    * in the struct after (sim, -cand), which is already unique per
    * anchor — it never drives the comparison.
    */
  private def bestNeg(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("anchor"))
      .agg(max(struct(col("sim"), (-col("cand")).as("__nc"),
        col("neg_label"))).as("__m"))
      .select(col("anchor"), (-col("__m.__nc")).as("neg_id"),
        col("__m.neg_label").as("neg_label"), col("__m.sim").as("neg_sim"))

  /** Per-anchor argmax over a (anchor, label, cand, sim) candidate
    * frame, joined with the negatives.
    */
  private def assemble(pairs: DataFrame, negs: DataFrame): DataFrame =
    bestPos(pairs)
      .join(broadcast(negs), "label")
      .select(col("anchor"), col("label"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_label"))

  /** (anchor, label, pos_id, pos_sim, neg_id, neg_label) — one row
    * per vector that has at least one same-label peer. EXACT route:
    * within-label all-pairs (quadratic per class — measured 8.6× wall
    * on 10× data; the oracle/small-class tier, like
    * `EmbeddingDedup.cosinePairs`). Past task-sized classes, use
    * [[mineLsh]].
    */
  def mine(df: DataFrame, idCol: Column, embCol: Column,
           labelCol: Column): DataFrame = {
    val base = prep(df, idCol, embCol, labelCol)
    val pairs = base.as("a")
      .join(base.as("b"),
        col("a.label") === col("b.label") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("anchor"), col("a.label").as("label"),
        col("b.id").as("cand"),
        round(VectorKernels.cosine(col("a.emb"), col("b.emb")), 4).as("sim"))
    assemble(pairs, negativesFor(base))
  }

  /** The SCALE route for positives: candidates from sign-hyperplane
    * LSH band collisions WITHIN the label (band keys already encode
    * the band index; the label joins alongside), verified with the
    * exact cosine, per-anchor argmax over the candidate set.
    * Sub-quadratic: pair work ∝ bucket collisions, not class².
    * Recall-approximate — an anchor whose true nearest neighbor never
    * shares a band mines a farther positive (or none); mined
    * positives are always genuine same-label vectors with exact
    * verified similarity, and `pos_sim ≤` the exact route's by
    * construction (TripletsSpec pins both properties, plus exact
    * recovery on planted near-duplicates). Negatives are identical to
    * [[mine]]'s.
    */
  def mineLsh(df: DataFrame, idCol: Column, embCol: Column,
              labelCol: Column, dim: Int,
              bands: Int = graft.dedup.EmbeddingDedup.NumBands,
              bits: Int = graft.dedup.EmbeddingDedup.BitsPerBand,
              seed: Long = 42L): DataFrame = {
    val base = prep(df, idCol, embCol, labelCol)
    val planes = graft.dedup.EmbeddingDedup.hyperplanes(dim, bands, bits, seed)
    val keys = base.select(col("id"), col("label"),
      explode(VectorKernels.hyperplaneBandKeys(col("emb"), planes, dim,
        bands, bits)).as("bk"))
    val cands = keys.as("a")
      .join(keys.as("b"), col("a.bk") === col("b.bk")
        && col("a.label") === col("b.label") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("anchor"), col("a.label").as("label"),
        col("b.id").as("cand"))
      .distinct()
    val pairs = cands
      .join(base.select(col("id").as("anchor"), col("emb").as("__ea")), "anchor")
      .join(base.select(col("id").as("cand"), col("emb").as("__eb")), "cand")
      .select(col("anchor"), col("label"), col("cand"),
        round(VectorKernels.cosine(col("__ea"), col("__eb")), 4).as("sim"))
    assemble(pairs, negativesFor(base))
  }

  /** HARD negatives: for each anchor, the nearest OTHER-label vector —
    * the negative that actually moves an embedding model (a random
    * negative is usually already far; the boundary cases are the
    * near-miss wrong-label ones). Output adds `neg_sim`.
    *
    * EXACT route: the cross-label pair set is nearly the full M×N
    * (every pair except same-label ones), so this is the oracle/small
    * tier — the quadratic cost is the problem's nature, and the scale
    * path is the same LSH trick with the label constraint FLIPPED
    * (band collisions ACROSS labels), composing exactly like
    * [[mineLsh]]. Anchors keep a row only if they also have a
    * same-label positive, mirroring [[mine]].
    */
  def mineHard(df: DataFrame, idCol: Column, embCol: Column,
               labelCol: Column): DataFrame = {
    val base = prep(df, idCol, embCol, labelCol)
    val posPairs = base.as("a")
      .join(base.as("b"),
        col("a.label") === col("b.label") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("anchor"), col("a.label").as("label"),
        col("b.id").as("cand"),
        round(VectorKernels.cosine(col("a.emb"), col("b.emb")), 4).as("sim"))
    val pos = bestPos(posPairs)
    val negPairs = base.as("a")
      .join(base.as("b"), col("a.label") =!= col("b.label"))
      .select(col("a.id").as("anchor"), col("b.id").as("cand"),
        col("b.label").as("neg_label"),
        round(VectorKernels.cosine(col("a.emb"), col("b.emb")), 4).as("sim"))
    val neg = bestNeg(negPairs)
    pos.join(neg, "anchor")
      .select(col("anchor"), col("label"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_label"), col("neg_sim"))
  }

  /** The SCALE route for HARD negatives — [[mineLsh]]'s trick with the
    * label constraint FLIPPED, exactly as [[mineHard]]'s doc promises:
    * negative candidates come from hyperplane-band collisions ACROSS
    * labels (near-miss wrong-label vectors land in the same buckets
    * precisely because they are angularly close), positives from
    * same-label collisions; both sides exact-cosine verified with a
    * per-anchor argmax. Pair work ∝ bucket collisions, not M×N.
    *
    * Recall-approximate on BOTH sides: an anchor whose true hardest
    * negative never shares a band mines a softer negative (`neg_sim ≤`
    * the exact route's, and `pos_sim ≤` likewise — TripletsSpec pins
    * both, plus recovery of planted near-miss negatives). Mined rows
    * are always genuine (other-label negative, same-label positive)
    * with exact verified similarities. Cosine-1.0 candidates are
    * mined DETERMINISTICALLY: parallel vectors produce identical
    * hyperplane signs, so every band collides — the exactness dial the
    * declared oracle gate runs on (planted scaled copies, same trick
    * as `dedup_embedding_lsh`).
    */
  def mineHardLsh(df: DataFrame, idCol: Column, embCol: Column,
                  labelCol: Column, dim: Int,
                  bands: Int = graft.dedup.EmbeddingDedup.NumBands,
                  bits: Int = graft.dedup.EmbeddingDedup.BitsPerBand,
                  seed: Long = 42L): DataFrame = {
    val base = prep(df, idCol, embCol, labelCol)
    val planes = graft.dedup.EmbeddingDedup.hyperplanes(dim, bands, bits, seed)
    val keys = base.select(col("id"), col("label"),
      explode(VectorKernels.hyperplaneBandKeys(col("emb"), planes, dim,
        bands, bits)).as("bk"))
    def verified(cands: DataFrame): DataFrame = cands
      .join(base.select(col("id").as("anchor"), col("emb").as("__ea")), "anchor")
      .join(base.select(col("id").as("cand"), col("emb").as("__eb")), "cand")
      .withColumn("sim",
        round(VectorKernels.cosine(col("__ea"), col("__eb")), 4))
    val posCands = keys.as("a")
      .join(keys.as("b"), col("a.bk") === col("b.bk")
        && col("a.label") === col("b.label") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("anchor"), col("a.label").as("label"),
        col("b.id").as("cand"))
      .distinct()
    val pos = bestPos(verified(posCands)
      .select(col("anchor"), col("label"), col("cand"), col("sim")))
    val negCands = keys.as("a")
      .join(keys.as("b"), col("a.bk") === col("b.bk")
        && col("a.label") =!= col("b.label"))
      .select(col("a.id").as("anchor"), col("b.id").as("cand"),
        col("b.label").as("neg_label"))
      .distinct()
    val neg = bestNeg(verified(negCands)
      .select(col("anchor"), col("cand"), col("neg_label"), col("sim")))
    pos.join(neg, "anchor")
      .select(col("anchor"), col("label"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_label"), col("neg_sim"))
  }

  /** DuckDB twin of [[mineHard]]. */
  def mineHardSql(table: String, idExpr: String, embExpr: String,
                  labelExpr: String): String =
    s"""WITH base AS (
       |  SELECT CAST($idExpr AS BIGINT) AS id, $embExpr AS emb,
       |    CAST($labelExpr AS BIGINT) AS label
       |  FROM $table WHERE $idExpr IS NOT NULL AND $embExpr IS NOT NULL
       |), pos AS (
       |  SELECT anchor, label, cand AS pos_id, sim AS pos_sim FROM (
       |    SELECT a.id AS anchor, a.label AS label, b.id AS cand,
       |      ${Sql.cosine("a.emb", "b.emb")} AS sim,
       |      row_number() OVER (PARTITION BY a.id
       |        ORDER BY ${Sql.cosine("a.emb", "b.emb")} DESC, b.id) AS rn
       |    FROM base a JOIN base b
       |      ON a.label = b.label AND a.id <> b.id)
       |  WHERE rn = 1
       |), neg AS (
       |  SELECT anchor, cand AS neg_id, neg_label, sim AS neg_sim FROM (
       |    SELECT a.id AS anchor, b.id AS cand, b.label AS neg_label,
       |      ${Sql.cosine("a.emb", "b.emb")} AS sim,
       |      row_number() OVER (PARTITION BY a.id
       |        ORDER BY ${Sql.cosine("a.emb", "b.emb")} DESC, b.id) AS rn
       |    FROM base a JOIN base b ON a.label <> b.label)
       |  WHERE rn = 1
       |)
       |SELECT p.anchor, p.label, p.pos_id, p.pos_sim,
       |  n.neg_id, n.neg_label, n.neg_sim
       |FROM pos p JOIN neg n USING (anchor)""".stripMargin

  /** DuckDB twin of [[mine]]. */
  def mineSql(table: String, idExpr: String, embExpr: String,
              labelExpr: String): String =
    s"""WITH base AS (
       |  SELECT CAST($idExpr AS BIGINT) AS id, $embExpr AS emb,
       |    CAST($labelExpr AS BIGINT) AS label
       |  FROM $table WHERE $idExpr IS NOT NULL AND $embExpr IS NOT NULL
       |), pos AS (
       |  SELECT anchor, label, cand AS pos_id, sim AS pos_sim FROM (
       |    SELECT a.id AS anchor, a.label AS label, b.id AS cand,
       |      ${Sql.cosine("a.emb", "b.emb")} AS sim,
       |      row_number() OVER (PARTITION BY a.id
       |        ORDER BY ${Sql.cosine("a.emb", "b.emb")} DESC, b.id) AS rn
       |    FROM base a JOIN base b
       |      ON a.label = b.label AND a.id <> b.id)
       |  WHERE rn = 1
       |), label_mins AS (
       |  SELECT label AS neg_label, id AS neg_id,
       |    ${negHashSql("id")} AS h FROM (
       |    SELECT id, label, row_number() OVER (PARTITION BY label
       |      ORDER BY ${negHashSql("id")}, id) AS rn
       |    FROM base)
       |  WHERE rn = 1
       |), top2 AS (
       |  SELECT neg_label, neg_id, h,
       |    row_number() OVER (ORDER BY h, neg_id) AS r
       |  FROM label_mins QUALIFY r <= 2
       |), negs AS (
       |  SELECT label, neg_id, neg_label FROM (
       |    SELECT l.neg_label AS label, t.neg_id, t.neg_label,
       |      row_number() OVER (PARTITION BY l.neg_label ORDER BY t.r) AS rn
       |    FROM label_mins l JOIN top2 t ON l.neg_label <> t.neg_label)
       |  WHERE rn = 1
       |)
       |SELECT p.anchor, p.label, p.pos_id, p.pos_sim, n.neg_id, n.neg_label
       |FROM pos p JOIN negs n USING (label)""".stripMargin
}
