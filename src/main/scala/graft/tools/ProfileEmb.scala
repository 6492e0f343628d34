package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.EmbeddingDedup
import graft.sources.Tables

/** Scratch profiler for the embedding-dedup tiers: prints formatted
  * plans and per-stage timings at the bench scale factor.
  */
object ProfileEmb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100).count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val emb = Tables.embeddings(spark, dir)
    time("exact cosinePairs") {
      EmbeddingDedup.cosinePairs(emb, col("vec_id"), col("embedding"), 0.35).count()
    }
    println(EmbeddingDedup.cosinePairs(emb, col("vec_id"), col("embedding"), 0.35)
      .queryExecution.executedPlan.toString.take(4000))

    val e2 = emb.select(col("vec_id").as("id"), col("embedding"))
    val planted = e2.select((col("id") + 1000000L).as("id"),
      transform(col("embedding"), x => (x * lit(2.0f)).cast("float")).as("embedding"))
    val corpus = e2.unionAll(planted)
    time("lsh planted 8x16 @0.9") {
      EmbeddingDedup.cosineLshPairs(corpus, col("id"), col("embedding"),
        0.9, 64, bands = 8, bits = 16).count()
    }
    time("lsh planted again (warm)") {
      EmbeddingDedup.cosineLshPairs(corpus, col("id"), col("embedding"),
        0.9, 64, bands = 8, bits = 16).count()
    }
    // decompose: candidates only
    val planes = EmbeddingDedup.hyperplanes(64, 8, 16, 42L)
    val base = corpus.select(col("id").cast("long").as("id"), col("embedding").as("emb"))
      .repartition(col("id"))
    val keys = base.select(col("id"),
      explode(graft.vector.VectorKernels.hyperplaneBandKeys(col("emb"), planes, 64, 8, 16))
        .as("band_key"))
    time("  keys only") { keys.count() }
    val cands = keys.as("l")
      .join(keys.as("r"), col("l.band_key") === col("r.band_key") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
    time("  candidates") { cands.count() }
    spark.stop()
  }
}
