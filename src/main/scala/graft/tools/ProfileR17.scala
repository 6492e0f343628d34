package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.sources.Tables

/** r17 optimization triage: stage-by-stage timings for the two most
  * expensive batch rows (dedup_edit_verified, ingest_chunk_table) and
  * the f7 conclusion path. Timed action mirrors the bench
  * (toRdd.count = full materialization).
  */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.queryExecution.toRdd.count()
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    // warmup
    spark.range(100).count(); docs.count()

    val t = Enrich.dedupContent(col("text"), col("doc_id"))
    val cands = Dedup.ngramJaccardPairsPrefix(docs, col("doc_id"), t)
    time("edit: candidates only")(cands)
    time("edit: full (cand+leven)")(
      Dedup.editVerifiedPairs(docs, col("doc_id"), t, cands, maxRelPermille = 50)
        .orderBy("id_a", "id_b"))

    val attrs = graft.api.Ingest.documentAttributes(
      docs, col("doc_id"), col("text"), pmod(col("doc_id"), lit(10)))
    time("ingest: attrs only")(attrs.drop("doc_text"))
    val chunks = graft.text.ChunkPacker.chunkDocuments(
      spark, attrs, "key", "doc_text").toDF()
    time("ingest: chunks only")(chunks)
    time("ingest: full")(graft.api.Ingest.chunkTable(spark,
        docs, col("doc_id"), col("text"), pmod(col("doc_id"), lit(10)),
        graft.embed.DeterministicEmbedder(dim = 16))
      .select(col("doc_key"), col("chunk_idx"), col("n_words"),
        col("file_name"), col("file_id"), col("court_level"),
        col("case_decision"), col("document_type")))

    spark.stop()
  }
}
