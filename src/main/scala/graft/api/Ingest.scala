package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.classify.{Cascades, CaseMetadata}
import graft.embed.Embedder
import graft.text.ChunkPacker

/** The §3.2 ingest pipeline (`process_pdf_to_milvus`,
  * `/root/reference/extract_and_embed_v2.py:322-385`) as one
  * DataFrame composition:
  *
  *   document rows → document-level attributes (file_id hash, type,
  *   decision with metadata retry) → per-document chunk flatMap →
  *   per-chunk embedding → fixed chunk-table schema → parquet append.
  *
  * Whole-document operators compute once per document and ride into
  * the chunk flatMap (no join-back needed for the computed columns —
  * they are projected before chunking, carried through as the flatMap
  * key joins back on one narrow column). Embedding happens after
  * chunking, chunk-parallel.
  */
object Ingest {

  /** Document-level attributes of the ingest path:
    * file_name/file_id (F3), document_type (C2), case_decision with
    * metadata-enriched retry (C1+C4 over S2-extracted metadata).
    */
  def documentAttributes(docs: DataFrame, idCol: Column, textCol: Column,
                         courtLevel: Column): DataFrame =
    attributes(docs, idCol.cast("string"),
      concat(lit("doc_"), idCol.cast("string"), lit(".pdf")),
      textCol, courtLevel)

  /** [[documentAttributes]] for documents that arrive with a REAL file
    * name (the serving layer's S3 uploads, where
    * `file_id = sha256(original filename)` per
    * `/root/reference/extract_and_embed.py:95`); the name doubles as
    * the chunking key.
    */
  def namedDocumentAttributes(docs: DataFrame, nameCol: Column,
                              textCol: Column, courtLevel: Column): DataFrame =
    attributes(docs, nameCol, nameCol, textCol, courtLevel)

  /** First-page analog for the metadata regexes: the reference scopes
    * case-number/parties extraction to `doc[0].get_text()` — the FIRST
    * page only (`/root/reference/extract_and_embed_v2.py:397-398`).
    * Full-text scanning was both unfaithful and the ingest path's
    * dominant cost: the reference's parties pattern backtracks
    * quadratically on non-matching text (measured 7.5s per 5k docs
    * full-text vs ~0.2s on the page-1 prefix).
    */
  private[api] val FirstPageChars = 3500

  private def attributes(docs: DataFrame, keyExpr: Column, fileName: Column,
                         textCol: Column, courtLevel: Column): DataFrame = {
    val page1 = substring(textCol, 1, FirstPageChars)
    // The parties pattern backtracks quadratically per scan, so scan
    // ONCE for the full match (group 0, staged in its own projection —
    // CollapseProject keeps a non-cheap multi-referenced alias staged)
    // and re-extract both groups from the short matched substring:
    // identical values (the match re-splits the same way on its own
    // text — greedy group preference is deterministic), half the
    // quadratic cost. The oracle keeps the reference's direct
    // two-group form, so the gate hash PROVES the equivalence.
    val staged = docs.select(
      keyExpr.as("key"),
      textCol.as("doc_text"),
      fileName.as("file_name"),
      sha2(fileName, 256).as("file_id"),
      courtLevel.cast("int").as("court_level"),
      Cascades.docType(textCol).as("document_type"),
      CaseMetadata.partiesExtract(page1, 0).as("__pm"),
      CaseMetadata.caseNumber(page1).as("__cn"))
    val meta = concat_ws(" ",
      col("__cn"),
      trim(CaseMetadata.partiesExtract(col("__pm"), 1)),
      trim(CaseMetadata.partiesExtract(col("__pm"), 2)))
    staged.select(
      col("key"), col("doc_text"), col("file_name"), col("file_id"),
      col("court_level"), col("document_type"),
      Cascades.decisionWithRetry(col("doc_text"), trim(meta))
        .as("case_decision"))
  }

  /** Full ingest: returns the reference chunk-table rows
    * (`extract_and_embed_v2.py:44-52` schema; chunk_id is
    * assigned-on-write like Milvus auto-id — unique, not contiguous).
    */
  def chunkTable(spark: SparkSession, docs: DataFrame, idCol: Column,
                 textCol: Column, courtLevel: Column,
                 embedder: Embedder, maxWords: Int = 400): DataFrame =
    chunkTableOf(spark, documentAttributes(docs, idCol, textCol, courtLevel),
      embedder, maxWords)

  /** Chunk-table rows from precomputed [[documentAttributes]] /
    * [[namedDocumentAttributes]] rows.
    */
  def chunkTableOf(spark: SparkSession, attrs: DataFrame,
                   embedder: Embedder, maxWords: Int = 400): DataFrame = {
    val chunks = ChunkPacker.chunkDocuments(spark, attrs, "key", "doc_text", maxWords)
      .toDF()
    chunks
      .join(attrs.drop("doc_text"), "key")
      .select(
        monotonically_increasing_id().as("chunk_id"),
        col("chunk_text").as("text"),
        embedder.embed(col("chunk_text")).as("embedding"),
        col("file_name"), col("file_id"), col("court_level"),
        col("case_decision"),
        // extras beyond the reference schema, useful downstream
        col("key").as("doc_key"), col("chunk_idx"), col("n_words"),
        col("document_type"))
  }

  /** [[chunkTableOf]] with the embedding computed OUT-OF-PLAN by the
    * batched HTTP client (F4's production arm,
    * `/root/reference/extract_and_embed_v2.py:352-369` fixed to one
    * RPC per batch instead of one per chunk): chunk rows are pinned
    * first (`localCheckpoint` — `monotonically_increasing_id` must not
    * re-evaluate between the embed pass and the join-back), the client
    * embeds (chunk_id, text) per-partition-batch, and the vectors
    * equi-join back on chunk_id. With `cfg.dropFailedBatches`, chunks
    * whose batch exhausted retries drop out of the table — the
    * reference's per-chunk `except: continue` at batch granularity.
    */
  def chunkTableRemote(spark: SparkSession, attrs: DataFrame,
                       cfg: graft.embed.HttpEmbedder.Config,
                       maxWords: Int = 400): DataFrame = {
    val chunks = ChunkPacker.chunkDocuments(spark, attrs, "key", "doc_text", maxWords)
      .toDF()
    val base = chunks
      .join(attrs.drop("doc_text"), "key")
      .select(
        monotonically_increasing_id().as("chunk_id"),
        col("chunk_text").as("text"),
        col("file_name"), col("file_id"), col("court_level"),
        col("case_decision"),
        col("key").as("doc_key"), col("chunk_idx"), col("n_words"),
        col("document_type"))
      .localCheckpoint()
    val vecs = graft.embed.HttpEmbedder.embed(spark, base, "chunk_id", "text", cfg)
    base.join(vecs, "chunk_id")
      .select(col("chunk_id"), col("text"), col("embedding"),
        col("file_name"), col("file_id"), col("court_level"),
        col("case_decision"), col("doc_key"), col("chunk_idx"),
        col("n_words"), col("document_type"))
  }

  /** S5 sink analog: append to the chunk-table parquet, partitioned by
    * court_level (the only scalar filter the flagship query uses —
    * partition pruning replaces Milvus's bitset pre-filter). The atomic
    * job commit is the `flush()` durability barrier.
    */
  def write(chunkTable: DataFrame, path: String): Unit =
    chunkTable.write.mode("append").partitionBy("court_level").parquet(path)
}
