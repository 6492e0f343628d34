package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.sources.Tables

/** r17: isolate the levenshtein kernel's cost from the text join-back
  * in dedup_edit_verified's verify tier.
  */
object ProfileLeven {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
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
    val texts = docs.select(col("doc_id").as("__eid"), t.as("__etext"))
    // materialize candidates once so every variant pays the same input
    val cands = Dedup.ngramJaccardPairsPrefix(docs, col("doc_id"), t)
      .localCheckpoint()
    val joined = cands
      .join(texts.select(col("__eid").as("id_a"), col("__etext").as("__ta")), "id_a")
      .join(texts.select(col("__eid").as("id_b"), col("__etext").as("__tb")), "id_b")
      .withColumn("max_len",
        greatest(length(col("__ta")), length(col("__tb"))).cast("long"))
    def run(label: String, dist: org.apache.spark.sql.Column): Unit =
      time(label)(joined.withColumn("edit_dist", dist)
        .where(col("edit_dist") >= 0L &&
          col("edit_dist") * 1000L <= lit(50L) * col("max_len"))
        .select(col("id_a"), col("id_b"), col("edit_dist"), col("max_len")))
    val thr = (lit(50L) * col("max_len") / 1000L).cast("int")
    time("join-back only (texts evaluated)")(
      joined.select(col("id_a"), col("id_b"),
        (length(col("__ta")) + length(col("__tb"))).as("l")))
    run("banded levenshtein (current)",
      call_function("levenshtein", col("__ta"), col("__tb"), thr).cast("long"))
    run("eq fast-path + banded",
      when(col("__ta") === col("__tb"), lit(0L))
        .otherwise(call_function("levenshtein", col("__ta"), col("__tb"), thr)
          .cast("long")))
    run("full levenshtein (no threshold)",
      call_function("levenshtein", col("__ta"), col("__tb")).cast("long"))
    run("EditKernel affix-trim banded",
      graft.dedup.EditKernel.editDist(col("__ta"), col("__tb"), thr)
        .cast("long"))
    spark.stop()
  }
}
