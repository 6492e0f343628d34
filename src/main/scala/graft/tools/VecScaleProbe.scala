package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-scale (x10/x30/x100) replay of the EMBEDDING families — the
  * r13 verdict's remaining extrapolation: dedup/spans had 100×
  * evidence, the vector families only 10×/30×. Same one-JVM
  * convention as [[DocScaleProbe]] (this host's ±40% cross-process
  * ambient makes separate-process ratios untrustworthy).
  *
  * Legs measure the ROUTES at their scale operating points, under a
  * FIXED query load as the corpus grows — the 100 TB question is
  * "what does serving/deduping cost as the corpus scales", not "what
  * does the exactness gate cost" (the `dedup_semantic_clustered` /
  * `knn_ivf_join_full_probe` GATE queries deliberately carry exact
  * all-pairs / full-probe legs as their oracle tier — quadratic BY
  * DESIGN and documented, so replaying them at 100× would measure
  * the dial, not the route):
  *
  *  - `ivf_knn_join`: build nlist=32 IVF (bounded 20k training
  *    sample) + serve 64 queries at nprobe=4 — candidates ∝ n/8;
  *  - `embedding_lsh`: [[graft.dedup.EmbeddingDedup.cosineLshPairs]]
  *    at the gate's parameters (8 bands × 16 bits, minCosine 0.9) —
  *    bucket-join candidates, no planted union (growth stays the
  *    corpus's own);
  *  - `semantic_clustered`: SemDeDup route with nlist TRACKING the
  *    corpus (~2k expected cluster size, the paper's operating point;
  *    the gate pins nlist=8 as its soundness dial) under
  *    KeepFarthestFromCentroid;
  *  - `maxsim_serve`: 4 queries × 16 facets over docs of ~20 chunks
  *    (doc COUNT scales, doc SIZE does not — the realistic corpus
  *    growth) at k=10.
  *
  * Usage: runMain graft.tools.VecScaleProbe <dirsCsv> [outPath]
  * where each dir holds an `embeddings.parquet` (ScaleData output).
  */
object VecScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").map(_.trim).toSeq
    val outPath = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.dedup.{EmbeddingDedup, SemDedup}
    import graft.vector.Ann

    // fixed query load: the base copy's first 64 ids exist at every
    // scale (ScaleData offsets copies by 1e8)
    def legs: Seq[(String, DataFrame => DataFrame)] = Seq(
      "ivf_knn_join" -> { emb =>
        val idx = Ann.buildIvf(emb, nlist = 32, maxTrainRows = 20000)
        Ann.ivfKnnJoin(
          emb.where(col("vec_id") < 64)
            .select(col("vec_id").as("id"), col("embedding")),
          idx, k = 10, nprobe = 4)
      },
      "embedding_lsh" -> { emb =>
        EmbeddingDedup.cosineLshPairs(
          emb.select(col("vec_id").as("id"), col("embedding")),
          col("id"), col("embedding"),
          minCosine = 0.9, dim = 64, bands = 8, bits = 16)
      },
      "semantic_clustered" -> { emb =>
        val n = emb.count()
        val nlist = math.max(8L, n / 2000L).toInt
        SemDedup.semanticKeep(
          SemDedup.assignClusters(emb, col("vec_id"), col("embedding"),
            nlist = nlist, maxTrainRows = 20000),
          minCosine = 0.35, SemDedup.KeepFarthestFromCentroid)
      },
      "maxsim_serve" -> { emb =>
        graft.search.MaxSim.maxSimTopK(
          emb.select((col("vec_id") / 20).as("doc_id"), col("embedding")),
          col("doc_id"), col("embedding"),
          emb.where(col("vec_id") < 64)
            .select((col("vec_id") / 16).as("query_id"), col("vec_id"),
              col("embedding")),
          col("query_id"), col("vec_id"), col("embedding"), k = 10)
      })

    spark.range(100).count()
    val rows = for (dir <- dirs; (name, mk) <- legs) yield {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      // min of two in-session runs, full materialization (the honest
      // r12 bench action)
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk(emb).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$dir%-28s $name%-24s $secs%8.2fs")
      (dir, name, secs)
    }
    val json = "{" + dirs.map { d =>
      s""""$d":{""" + rows.collect { case (`d`, n, s) =>
        s""""$n":${f"$s%.3f"}""" }.mkString(",") + "}"
    }.mkString(",") + "}"
    println(json)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
