package graft.vector

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column — the
  * batch analog of the reference's Milvus IVF_FLAT index
  * (`/root/reference/extract_and_embed.py:54`, nlist=128, metric L2).
  *
  *  - [[cosineTopK]] / [[l2TopK]]: exact brute-force baseline. A
  *    narrow scan + `TakeOrderedAndProject` — embarrassingly parallel,
  *    no shuffle; this is the correctness oracle and is already the
  *    right plan for one-off queries at any corpus size.
  *  - [[IvfIndex]]: offline KMeans (the IVF "coarse quantizer") →
  *    `cluster_id` column. At scale the corpus is *written partitioned
  *    by cluster_id*, so a probe query's `cluster_id IN (...)` filter
  *    becomes Parquet partition pruning: only nprobe/nlist of the data
  *    is read — the same recall/throughput dial IVF_FLAT exposes.
  */
object Ann {

  /** Exact top-k by cosine similarity (descending), deterministic
    * tie-break; `query` is a 1-row frame with `q_emb`.
    */
  def cosineTopK(corpus: DataFrame, query: DataFrame, emb: Column,
                 id: Column, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .withColumn("sim", round(Distance.cosine(emb, col("q_emb")), 4))
      .drop("q_emb")
      .orderBy(col("sim").desc, id.asc)
      .limit(k)

  /** Exact top-k by L2 (ascending). */
  def l2TopK(corpus: DataFrame, query: DataFrame, emb: Column,
             id: Column, k: Int): DataFrame =
    corpus.crossJoin(broadcast(query))
      .withColumn("score", round(Distance.l2(emb, col("q_emb")), 4))
      .drop("q_emb")
      .orderBy(col("score").asc, id.asc)
      .limit(k)

  /** IVF index: corpus rows annotated with their nearest-centroid
    * `cluster_id`, plus the centroids themselves for probe selection.
    */
  final case class IvfIndex(assigned: DataFrame, centroids: Array[MlVector]) {

    /** Probe the `nprobe` clusters nearest to `queryVec`, then exact
      * L2 top-k within them. Cluster selection runs on the driver over
      * `nlist` centroids (tiny); the corpus-side filter is a pushdown-
      * friendly `cluster_id IN (...)`.
      */
    def searchL2(queryVec: Seq[Float], k: Int, nprobe: Int,
                 emb: String = "embedding", id: String = "vec_id"): DataFrame = {
      val q = queryVec.map(_.toDouble).toArray
      val probes = centroids.zipWithIndex
        .map { case (c, i) =>
          val d = c.toArray.zip(q).map { case (x, y) => (x - y) * (x - y) }.sum
          (i, d)
        }
        .sortBy { case (i, d) => (d, i) }
        .take(nprobe).map(_._1)
      val spark = assigned.sparkSession
      val query = spark.createDataFrame(Seq(Tuple1(queryVec))).toDF("q_emb")
      l2TopK(assigned.where(col("cluster_id").isin(probes.toSeq: _*)),
        query, col(emb), col(id), k)
    }
  }

  /** Build the IVF coarse quantizer: MLlib KMeans over the embedding
    * column (seeded, deterministic for a fixed partitioning), assigning
    * each row its cluster id. At write time, partitioning the output by
    * `cluster_id` turns probes into partition pruning.
    */
  def buildIvf(corpus: DataFrame, emb: String = "embedding",
               nlist: Int = 16, seed: Long = 42L): IvfIndex = {
    val featurized = corpus.withColumn("features",
      array_to_vector(col(emb).cast("array<double>")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(featurized)
    IvfIndex(model.transform(featurized).drop("features"), model.clusterCenters)
  }
}
