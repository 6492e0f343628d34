package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting for training-data pipelines —
  * §2.7 extension surface (the reference has no dataset-preparation
  * step at all). Two routes with one contract: every row gets a
  * `split` label in {train, val, test}, reproducibly — same corpus,
  * same ids → same split, on any cluster, any partitioning, any day.
  * `sample()`/`randomSplit()` cannot give that (seed × partitioning
  * dependent), which is why splitting must be a FUNCTION OF THE ID.
  *
  *  - [[assignByHash]]: split = pure affine-hash of the id. A
  *    projection — no shuffle, no state, streams at scan speed; THE
  *    route at 100 TB. Proportions are approximate (each row is an
  *    independent-ish Bernoulli draw; error O(1/√n) per stratum —
  *    negligible exactly when the corpus is big).
  *  - [[stratifiedExact]]: per-stratum rank over the same hash →
  *    exact floor(n·pct/100) proportions per stratum. Needs a
  *    per-stratum window (shuffle on stratum; each stratum must fit a
  *    task), so it is the route for BOUNDED strata — eval suites,
  *    per-language caps — not for corpus-sized ones.
  *
  * The hash is an affine map mod primes (identical arithmetic in
  * Spark and DuckDB — same pattern as
  * [[graft.api.Enrich.simhashContent]]): the id is first reduced mod
  * 1000003 so the multiply never overflows a signed 64-bit value for
  * ANY long id (ANSI mode throws on overflow; ids at 100 TB scale
  * exceed the naive `id * a` bound). Ids congruent mod 1000003 share
  * a bucket — harmless for splitting, which needs decorrelation from
  * data order, not cryptographic strength.
  */
object Splits {

  private val M = 1000003L  // pre-reduction modulus (prime)
  private val A = 2654435761L
  private val B = 40503L
  private val P = 99991L    // hash range (prime)

  /** The shared id hash, in [0, P). */
  def idHash(idCol: Column): Column =
    pmod(pmod(idCol, lit(M)) * lit(A) + lit(B), lit(P))

  /** DuckDB twin of [[idHash]]. pmod vs `%`: both operands are
    * non-negative by construction (inner `%` of a non-negative id),
    * so `%` agrees with pmod — callers must pass non-negative ids.
    */
  def idHashSql(idExpr: String): String =
    s"(((($idExpr) % $M) * $A + $B) % $P)"

  /** Hash-split: `split` from the id alone. Pure projection. */
  def assignByHash(df: DataFrame, idCol: Column,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percents ($trainPct, $valPct)")
    // hash → [0,100) bucket; thresholds at the percent marks
    val bucket = pmod(idHash(idCol), lit(100L))
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** DuckDB twin of [[assignByHash]]'s split column. */
  def assignByHashSql(idExpr: String, trainPct: Int = 80,
                      valPct: Int = 10): String =
    s"""CASE WHEN ${idHashSql(idExpr)} % 100 < $trainPct THEN 'train'
       | WHEN ${idHashSql(idExpr)} % 100 < ${trainPct + valPct} THEN 'val'
       | ELSE 'test' END""".stripMargin

  /** Leakage-safe split: hash on the row's duplicate-CLUSTER
    * representative instead of its own id, so an entire near-duplicate
    * cluster always lands in ONE split. Splitting by row id leaks:
    * two near-identical documents can straddle train and test, and the
    * model is then evaluated on (a copy of) its training data — the
    * standard contamination failure that motivates cluster-aware
    * splitting in dataset curation.
    *
    * `clusterLabels` is `(id, cluster_id)` for CLUSTERED rows only
    * (e.g. [[graft.dedup.Components.dupClusters]]'s output — singleton
    * documents may be absent; they fall back to their own id, which is
    * exactly [[assignByHash]]'s behavior). One equi-join on the id —
    * broadcast when the clustered subset is small, shuffle otherwise
    * (AQE decides); the split itself stays a pure projection of the
    * representative, so the route inherits [[assignByHash]]'s
    * reproducibility contract.
    */
  def assignByClusterHash(df: DataFrame, idCol: Column,
                          clusterLabels: DataFrame,
                          trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percents ($trainPct, $valPct)")
    val reserved = Seq("__ls_id", "__ls_rep")
    reserved.foreach { c =>
      require(!df.columns.contains(c), s"input must not carry reserved column $c")
    }
    val labels = clusterLabels.select(col("id").as("__ls_id"),
      col("cluster_id").as("__ls_rep"))
    val bucket = pmod(idHash(coalesce(col("__ls_rep"), idCol)), lit(100L))
    df.join(labels, idCol === col("__ls_id"), "left")
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("__ls_id", "__ls_rep")
  }

  /** Exact stratified split: within each stratum, rank rows by
    * (hash, id) — a deterministic shuffle of the stratum — and cut at
    * floor(n·pct/100). `n·pct` stays far inside 2^53, so the
    * double-division floor is exact cross-engine.
    */
  def stratifiedExact(df: DataFrame, idCol: Column, stratumCol: Column,
                      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percents ($trainPct, $valPct)")
    val part = Window.partitionBy(stratumCol)
    val w = part.orderBy(idHash(idCol).asc, idCol.asc)
    val r = row_number().over(w).cast("long")
    val n = count(lit(1)).over(part)
    df.withColumn("split",
      when(r <= floor(n * trainPct / 100), "train")
        .when(r <= floor(n * (trainPct + valPct) / 100), "val")
        .otherwise("test"))
  }

  /** Exact stratified split WITHOUT the per-stratum row window — the
    * route when strata are corpus-sized. Produces BIT-IDENTICAL output
    * to [[stratifiedExact]] (same (hash, id) order, same floor cuts)
    * with this shape:
    *
    *  1. histogram: count per (stratum, hash) — one aggregation whose
    *     cardinality is bounded by |strata|·P (P = 99991), NOT by the
    *     corpus;
    *  2. cumulative counts + the two percent thresholds per stratum —
    *     a window over the HISTOGRAM (bounded), yielding for each
    *     threshold its boundary bucket `hb` and the count `base` of
    *     rows hashing strictly below it;
    *  3. assignment: every row joins the 1-row-per-stratum bounds via
    *     broadcast. Rows whose hash is not a boundary bucket are
    *     labeled by pure comparison — a projection, no shuffle. Only
    *     rows INSIDE a boundary bucket (expected n/P per stratum —
    *     thousands, not billions) are ranked by id to decide which
    *     side of the cut they fall on.
    *
    * So the corpus is touched twice (histogram, assignment), both
    * embarrassingly parallel; nothing corpus-sized is ever sorted,
    * windowed, or collected. Worst case: ids congruent mod M collapse
    * into one hash bucket, growing the boundary-rank window toward a
    * stratum's size — the same bound [[stratifiedExact]] always pays.
    */
  def stratifiedScalable(df: DataFrame, idCol: Column, stratumCol: Column,
                         trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percents ($trainPct, $valPct)")
    require(!df.columns.exists(_.startsWith("__")),
      "input columns starting with __ collide with split helper columns")
    // Everything below groups/windows on __s directly (NULL is a
    // legitimate stratum value; group-by and window partitions treat
    // it as its own group, so no join can drop it)
    val hist = df.groupBy(stratumCol.as("__s"), idHash(idCol).as("__h"))
      .agg(count(lit(1)).as("__c"))
    val part = Window.partitionBy("__s")
    val cum = hist
      .withColumn("__cum", sum("__c").over(part.orderBy("__h")))
      .withColumn("__n", max("__cum").over(part))
      .withColumn("__t1", floor(col("__n") * trainPct / 100))
      .withColumn("__t2", floor(col("__n") * (trainPct + valPct) / 100))
    // boundary bucket for threshold t: the unique bucket with
    // cum − c < t ≤ cum (absent when t = 0 — then no rows sit at or
    // below t and the sentinel −1 matches no hash). Conditional
    // aggregation — not a join — extracts it per stratum.
    def pick(cond: Column, v: Column) = max(when(cond, v))
    val b1 = col("__cum") - col("__c") < col("__t1") && col("__cum") >= col("__t1")
    val b2 = col("__cum") - col("__c") < col("__t2") && col("__cum") >= col("__t2")
    val bounds = cum.groupBy("__s").agg(
      max("__t1").as("__t1"), max("__t2").as("__t2"),
      coalesce(pick(b1, col("__h")), lit(-1L)).as("__hb1"),
      coalesce(pick(b1, col("__cum") - col("__c")), lit(0L)).as("__base1"),
      coalesce(pick(b2, col("__h")), lit(-1L)).as("__hb2"),
      coalesce(pick(b2, col("__cum") - col("__c")), lit(0L)).as("__base2"))
    // null-safe equality: a NULL stratum is a legitimate stratum (the
    // window route partitions on it like any other value); a plain
    // equi-join would silently drop those rows
    val withKeys = df.withColumn("__s", stratumCol)
      .withColumn("__h", idHash(idCol))
    val rows = withKeys
      .join(broadcast(bounds.withColumnRenamed("__s", "__bs")),
        col("__s") <=> col("__bs"))
    val isBoundary = col("__h") === col("__hb1") || col("__h") === col("__hb2")
    val outCols = df.columns.map(col).toSeq :+ col("split")
    // non-boundary: the bucket sits strictly inside one slice
    val plain = rows.where(!isBoundary)
      .withColumn("split",
        when(col("__h") < col("__hb1"), "train")
          .when(col("__hb2") >= 0 && col("__h") < col("__hb2")
            && col("__h") > col("__hb1"), "val")
          .otherwise("test"))
      .select(outCols: _*)
    // boundary: rank by id inside the bucket; global rank = base + r.
    // The same ranked test covers hb1 = hb2 (both cuts in one bucket).
    val wb = Window.partitionBy("__s", "__h").orderBy(idCol.asc)
    val ranked = rows.where(isBoundary)
      .withColumn("__rank",
        when(col("__h") === col("__hb1"), col("__base1"))
          .otherwise(col("__base2")) + row_number().over(wb).cast("long"))
      .withColumn("split",
        when(col("__rank") <= col("__t1"), "train")
          .when(col("__rank") <= col("__t2"), "val")
          .otherwise("test"))
      .select(outCols: _*)
    plain.unionAll(ranked)
  }

  /** DuckDB twin of [[stratifiedExact]]: emits a full SELECT over
    * `table` with the given output columns plus `split`.
    */
  def stratifiedExactSql(table: String, idExpr: String, stratumExpr: String,
                         outCols: Seq[String], trainPct: Int = 80,
                         valPct: Int = 10): String =
    s"""SELECT ${outCols.mkString(", ")},
       | CASE WHEN r <= floor(n * $trainPct / 100) THEN 'train'
       |      WHEN r <= floor(n * ${trainPct + valPct} / 100) THEN 'val'
       |      ELSE 'test' END AS split
       |FROM (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY $stratumExpr
       |      ORDER BY ${idHashSql(idExpr)}, $idExpr) AS r,
       |    count(*) OVER (PARTITION BY $stratumExpr) AS n
       |  FROM $table)""".stripMargin

  /** Deterministic training order: every row gets a shard in
    * [0, nShards) and a 1-based position within its shard — together a
    * reproducible global permutation (read shards in index order,
    * rows in position order) DECOUPLED from crawl/ingest order, which
    * is exactly what a training run needs to avoid accidental
    * curriculum (all of one domain first) while staying re-runnable
    * bit-for-bit: same corpus, same salt → same order, any cluster,
    * any partitioning. `rand()`-shuffles guarantee neither.
    *
    * Scale shape: shard assignment is a pure projection; the position
    * is one window per shard, so each shard's rows must fit a task's
    * sort spill budget — size `nShards` so corpus/nShards is
    * task-sized (the same rule the shard-file writer
    * [[graft.sources.Layout]] already applies to bytes).
    */
  def shardOrder(df: DataFrame, idCol: Column, nShards: Int,
                 salt: String = "order"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val reserved = df.columns.toSet.intersect(Set("shard", "pos"))
    require(reserved.isEmpty,
      s"shardOrder emits columns shard/pos; rename on the input: $reserved")
    val shard = pmod(idHash(idCol), lit(nShards.toLong)).cast("int")
    val w = Window.partitionBy(shard)
      .orderBy(Sampling.hashKey(idCol, salt), idCol.asc)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
  }

  /** DuckDB twin of [[shardOrder]]. */
  def shardOrderSql(table: String, idExpr: String, nShards: Int,
                    salt: String, selectCols: String): String =
    s"""SELECT $selectCols,
       |  CAST(${idHashSql(idExpr)} % $nShards AS INTEGER) AS shard,
       |  CAST(row_number() OVER (
       |    PARTITION BY ${idHashSql(idExpr)} % $nShards
       |    ORDER BY ${Sampling.hashKeySql(idExpr, salt)}, $idExpr)
       |    AS INTEGER) AS pos
       |FROM $table""".stripMargin
}
