package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** F1 + F2 — paragraph split and greedy chunk packing, the reference's
  * ingest-side text pipeline (`/root/reference/extract_and_embed.py:62-77`,
  * clones in all four services).
  *
  * The packer is an order-dependent stateful fold — not columnar — so
  * it runs as a per-document `flatMap` over a typed Dataset: document
  * rows are independent, so the operation is embarrassingly parallel
  * and scales with the number of documents regardless of per-doc size.
  *
  * Bit-for-bit quirks of the reference, preserved deliberately:
  *  - paragraphs accumulate via `current += "\n" + para` (no space), so
  *    for *counting* the last word of the buffer merges with the first
  *    word of the candidate paragraph (`len((current + para).split())`);
  *  - the comparison is strict `<` against the budget;
  *  - when the *first* paragraph alone reaches the budget, the empty
  *    buffer is flushed: an empty-string chunk is emitted (Python
  *    `chunks.append("".strip())`), and the oversized paragraph seeds
  *    the next chunk unsplit;
  *  - a trailing non-empty buffer is always emitted.
  */
object ChunkPacker {

  /** F1: `text.split("\n\n")` → strip → drop empties
    * (`extract_and_embed.py:63`).
    */
  def paragraphs(text: String): Seq[String] =
    text.split("\n\n", -1).toSeq.map(_.strip).filter(_.nonEmpty)

  /** Python `len(s.split())`: count whitespace-separated words. */
  private[text] def wordCount(s: String): Int = {
    var n = 0; var inWord = false
    var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inWord) { n += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    n
  }

  /** F2: greedy fold of paragraphs into ~maxWords chunks
    * (`extract_and_embed.py:62-77`). Direct transcription.
    */
  def pack(paras: Seq[String], maxWords: Int = 400): Seq[String] = {
    val chunks = scala.collection.mutable.ArrayBuffer[String]()
    var current = ""
    for (para <- paras) {
      if (wordCount(current + para) < maxWords)
        current += "\n" + para
      else {
        chunks += current.strip
        current = para
      }
    }
    if (current.nonEmpty) chunks += current.strip
    chunks.toSeq
  }

  def chunkText(text: String, maxWords: Int = 400): Seq[String] =
    pack(paragraphs(text), maxWords)

  /** One emitted chunk of a document. */
  final case class Chunk(key: String, chunk_idx: Int, chunk_text: String, n_words: Long)

  /** DataFrame wrapper: (key, text) rows → exploded chunk rows. The
    * flatMap is narrow (no shuffle); document attributes computed
    * upstream ride along by joining on `key` or, cheaper, by computing
    * them on the document row before chunking.
    */
  def chunkDocuments(spark: SparkSession, docs: DataFrame,
                     keyCol: String, textCol: String,
                     maxWords: Int = 400): Dataset[Chunk] = {
    import spark.implicits._
    docs.selectExpr(s"CAST($keyCol AS STRING)", textCol).as[(String, String)]
      .flatMap { case (key, text) =>
        chunkText(if (text == null) "" else text, maxWords).zipWithIndex.map {
          case (c, i) => Chunk(key, i, c, wordCount(c).toLong)
        }
      }
  }
}
