package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.sources.Tables

/** r17 triage: split dedup_edit_verified cost between candidate
  * generation, text join-back, the levenshtein kernel, and the final
  * sort.
  */
object ProfileEdit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.queryExecution.toRdd.count()
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    spark.range(100).count()
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    val t = Enrich.dedupContent(col("text"), col("doc_id"))
    val cands = Dedup.ngramJaccardPairsPrefix(docs, col("doc_id"), t)
    val texts = docs.select(col("doc_id").as("__eid"), t.as("__etext"))

    time("candidates full")(cands)
    val joined = cands
      .join(texts.select(col("__eid").as("id_a"), col("__etext").as("__ta")), "id_a")
      .join(texts.select(col("__eid").as("id_b"), col("__etext").as("__tb")), "id_b")
      .withColumn("max_len",
        greatest(length(col("__ta")), length(col("__tb"))).cast("long"))
    time("cand + join texts, no leven")(joined.drop("__ta", "__tb"))
    time("cand + join + leven")(joined
      .withColumn("edit_dist",
        call_function("levenshtein", col("__ta"), col("__tb"),
          (lit(50L) * col("max_len") / 1000L).cast("int")).cast("long"))
      .where(col("edit_dist") >= 0L &&
        col("edit_dist") * 1000L <= lit(50L) * col("max_len"))
      .drop("__ta", "__tb"))
    time("full with orderBy")(
      Dedup.editVerifiedPairs(docs, col("doc_id"), t, cands, maxRelPermille = 50)
        .orderBy("id_a", "id_b"))
    // candidate-stage internals
    val base = docs.select(col("doc_id").as("id"),
      graft.dedup.Dedup.shingleHashes(t, 3).as("sh"))
    time("shingle arrays only")(base)
    val inv = base.select(col("id"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    time("inverted index explode")(inv)
    time("freq groupBy")(inv.groupBy("shingle").agg(count(lit(1)).as("df")))
    spark.stop()
  }
}
