package graft.vector

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
  *  - [[IvfIndex]]: bounded-sample Lloyd's k-means (the IVF "coarse
  *    quantizer") trained driver-side, then one distributed codegen
  *    map ([[VectorKernels.NearestCentroid]]) assigns every row its
  *    `cluster_id`. At scale the corpus is *written partitioned by
  *    cluster_id*, so a probe query's `cluster_id IN (...)` filter
  *    becomes Parquet partition pruning: only nprobe/nlist of the data
  *    is read — the same recall/throughput dial IVF_FLAT exposes.
  *
  * Training on a bounded sample is the standard IVF recipe (a coarse
  * quantizer needs ~O(100·nlist) points): clustering cost stays
  * constant as the corpus grows to 100 TB, while assignment remains a
  * single embarrassingly-parallel scan. Driver-side Lloyd's on that
  * sample costs milliseconds and zero Spark jobs — a distributed
  * k-means (tens of tiny jobs per fit) only pays off when the training
  * set itself can't fit on the driver, which a capped sample never hits.
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
  final case class IvfIndex(assigned: DataFrame, centroids: Array[Array[Double]]) {

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
          val d = c.zip(q).map { case (x, y) => (x - y) * (x - y) }.sum
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

  /** IVF KNN JOIN: top-k L2 neighbors for EVERY query row, probing
    * only each query's `nprobe` nearest clusters — the M×N scale path
    * when neither side broadcasts and exactness can trade for the
    * probe dial. `queries` must carry `(id, embedding)` columns (the
    * [[graft.vector.Knn.similarityJoin]] contract); `emb`/`id` name
    * the INDEX side's columns. Same output contract as similarityJoin
    * (left_id, right_id, score, rank; 4dp rounding, id tie-breaks),
    * and EXACTLY equal to it when `nprobe ≥ nlist` for null-free
    * embeddings — rows with null embeddings are DROPPED on both sides
    * here (null probe lists and null cluster ids never join), whereas
    * the brute-force join ranks their null scores.
    *
    * Plan shape: a codegen per-row probe list (no driver loop, unlike
    * the 1-query [[IvfIndex.searchL2]]), explode to (query,
    * cluster_id), one equi-join against the cluster-keyed corpus —
    * when the corpus is WRITTEN partitioned by cluster_id the join's
    * scan prunes to probed clusters — then the bounded-state grouped
    * top-k. Shuffle ∝ candidates (nprobe/nlist of the cross product),
    * never M×N.
    */
  def ivfKnnJoin(queries: DataFrame, index: IvfIndex, k: Int,
                 nprobe: Int, emb: String = "embedding",
                 id: String = "vec_id"): DataFrame = {
    val probes = queries.select(col("id").as("left_id"),
      col("embedding").as("q_emb"),
      explode(VectorKernels.nearestCentroids(col("embedding"),
        index.centroids, nprobe)).as("cluster_id"))
    val cands = probes
      .join(index.assigned.select(col(id).as("__rid"), col(emb).as("r_emb"),
        col("cluster_id")), Seq("cluster_id"))
      .select(col("left_id"), col("__rid").as("id"),
        round(Distance.l2(col("q_emb"), col("r_emb")), 4).as("score"))
    GroupedTopK.topKPerGroup(cands, col("left_id"), k)
      .select(col("left_id"), col("id").as("right_id"), col("score"),
        col("rank"))
  }

  /** IVF-PQ KNN join: IVF routing over a PQ-COMPRESSED corpus — the
    * canonical billion-vector serving layout (FAISS `IVFx,PQy`; this is
    * the `by_residual=false` variant: codes quantize the raw vector,
    * the cluster only routes). Storage per corpus row is a cluster id
    * plus `m` codes (`m·log2(ksub)` bits, 16–32× under float32), and a
    * query decodes only the candidates its probed clusters yield —
    * `L2(q, decode(codes))` IS the ADC distance (see
    * [[Quantize.pqDecode]]), so the scan never touches a float vector.
    *
    * Same output contract as [[ivfKnnJoin]]. With `nprobe ≥ nlist` AND
    * a full codebook (ksub ≥ distinct subvectors) this is EXACTLY the
    * brute-force join — both degradation dials sit under one oracle
    * gate. The residual variant (`by_residual=true`, PQ over
    * `x − centroid`) improves lossy-setting recall but its round-trip
    * `(x−c)+c` is not FP-bit-exact, so it cannot sit under a
    * bit-identical gate; at full codebook the two variants coincide
    * in storage cost and this one stays provable.
    */
  def ivfPqKnnJoin(queries: DataFrame, index: IvfIndex,
                   pq: Quantize.PqModel, k: Int, nprobe: Int,
                   emb: String = "embedding",
                   id: String = "vec_id"): DataFrame = {
    // the stored serving form: routing key + codes, no float payload
    val codes = index.assigned.select(col(id).as("__rid"),
      col("cluster_id"), Quantize.pqEncode(pq, col(emb)).as("__codes"))
    val probes = queries.select(col("id").as("left_id"),
      col("embedding").as("q_emb"),
      explode(VectorKernels.nearestCentroids(col("embedding"),
        index.centroids, nprobe)).as("cluster_id"))
    val cands = probes.join(codes, Seq("cluster_id"))
      .select(col("left_id"), col("__rid").as("id"),
        round(Distance.l2(col("q_emb"),
          Quantize.pqDecode(pq, col("__codes"))), 4).as("score"))
    GroupedTopK.topKPerGroup(cands, col("left_id"), k)
      .select(col("left_id"), col("id").as("right_id"), col("score"),
        col("rank"))
  }

  /** Build the IVF coarse quantizer: seeded Lloyd's k-means over a
    * bounded driver-side sample of the embedding column, then a codegen
    * nearest-centroid map assigning each corpus row its cluster id.
    */
  def buildIvf(corpus: DataFrame, emb: String = "embedding",
               nlist: Int = 16, seed: Long = 42L,
               maxIter: Int = 10, maxTrainRows: Int = 100000): IvfIndex = {
    // Deterministic pseudo-random sample: order by a content hash, not a
    // partition-order prefix — reproducible across partitionings and
    // unbiased on sorted/clustered corpora. Plans as TakeOrderedAndProject
    // (per-partition heap of maxTrainRows, no full sort/shuffle).
    val sample = corpus.select(col(emb))
      .orderBy(xxhash64(col(emb)), col(emb))
      .limit(maxTrainRows)
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val centroids = lloyd(sample, nlist, maxIter, seed)
    val assigned = corpus.withColumn("cluster_id",
      VectorKernels.nearestCentroid(col(emb), centroids))
    IvfIndex(assigned, centroids)
  }

  /** Persist an [[IvfIndex]] as two parquet tables under `path`
    * (`assigned/` — the corpus with its cluster labels, partitioned BY
    * cluster so a probe reads only its nprobe partitions; `centroids/`
    * — nlist rows of (cluster_id, centroid)). This is the engine's
    * analog of the reference's Milvus collection lifecycle
    * (`/root/reference/extract_and_embed.py:37-59` create +
    * `load_collection`): build once, serve many times, survive the
    * process. Writing the assignment, not just the centroids, is the
    * point — re-assigning 100 TB on every load would repeat the most
    * expensive step.
    */
  def saveIvf(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned.write.mode("overwrite")
      .partitionBy("cluster_id").parquet(s"$path/assigned")
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cluster_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted [[IvfIndex]]. The centroid table is nlist rows —
    * the one intentionally-driver-sized piece; the assignment loads
    * lazily as a partitioned scan (cluster_id pruning reaches the
    * directory level, so an nprobe search touches nprobe directories).
    */
  def loadIvf(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select("cluster_id", "centroid").orderBy("cluster_id")
      .collect()
      .map(r => r.getSeq[Double](1).toArray)
    IvfIndex(spark.read.parquet(s"$path/assigned"), cents)
  }

  /** Plain Lloyd's: seeded distinct-point init, squared-L2 assignment
    * with lowest-index tie-break, mean update; empty clusters keep
    * their previous centroid. Runs entirely on the driver.
    */
  private[vector] def lloyd(points: Array[Array[Double]], k: Int,
                            maxIter: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "empty training sample")
    val n = points.length
    val dim = points.head.length
    // init candidates = first index of each DISTINCT point: duplicated
    // sample points must not spend two seeds on one location (and with
    // k ≥ #distinct this makes every distinct point a centroid — the
    // exactness property the PQ full-codebook gate relies on). On a
    // duplicate-free sample this is `points.indices` and the seeded
    // shuffle picks the same init as ever.
    val distinctIdx = {
      val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
      points.indices.filter(i => seen.add(points(i).toSeq)).toVector
    }
    val kk = math.min(k, distinctIdx.length)
    val rnd = new scala.util.Random(seed)
    val centroids = rnd.shuffle(distinctIdx).take(kk)
      .map(points(_).clone).toArray
    val assign = Array.fill(n)(-1)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0
          var j = 0
          while (j < dim) {
            val t = points(i)(j) - centroids(c)(j)
            d += t * t; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      if (moved) {
        val sums = Array.fill(kk)(new Array[Double](dim))
        val counts = new Array[Int](kk)
        var i2 = 0
        while (i2 < n) {
          val c = assign(i2)
          counts(c) += 1
          var j = 0
          while (j < dim) { sums(c)(j) += points(i2)(j); j += 1 }
          i2 += 1
        }
        var c = 0
        while (c < kk) {
          if (counts(c) > 0) {
            var j = 0
            while (j < dim) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
          }
          c += 1
        }
      }
      iter += 1
    }
    centroids
  }
}
