package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring SPAN extraction — the sequence-level
  * dedup of Lee et al., "Deduplicating Training Data Makes Language
  * Models Better" (ACL 2022): find every maximal run of >= `minTokens`
  * consecutive tokens that occurs more than once in the corpus and
  * report it as a removable `[span_start, span_end]` token interval
  * per document. Doc-level dedup ([[Dedup.ngramJaccardPairs]] and
  * friends) drops whole documents; this extracts the PARTIAL overlaps
  * those keep — boilerplate headers, licence blocks, quoted passages —
  * which is what the paper shows actually pollutes training data. The
  * reference has nothing in this family.
  *
  * Algorithm (the paper uses a suffix array; the distributed
  * equivalent is seed-and-extend): every length-`minTokens` token
  * n-gram is a SEED; a seed that occurs >= 2 times anywhere in the
  * corpus marks its interval `[pos, pos+minTokens-1]` as duplicated;
  * overlapping/adjacent duplicated intervals within a document merge
  * into maximal spans (gaps-and-islands). Any duplicated substring of
  * length >= minTokens is a union of duplicated seeds, so the merged
  * spans are exactly the maximal duplicated regions — the suffix
  * array's answer — without ever materialising a global sort.
  *
  * Scale shape: ONE shuffle of (gram-key, doc, pos) seeds for the
  * occurrence count (window count, map-side-combinable via the
  * two-level agg Catalyst plans for it), then a per-document window
  * over the few surviving duplicated seeds. Token text never shuffles
  * twice: at 100 TB the gram key is an 8-byte rolling/xxhash64 hash
  * instead of the gram string (collisions only ever ADD a candidate
  * seed, they cannot lose a span) — the string key here keeps the
  * DuckDB oracle exact. All outputs are integer token positions:
  * bit-identical across engines by construction.
  *
  * @return (doc_id, span_start, span_end, span_len) — 1-based
  *         inclusive token positions of each maximal duplicated span.
  */
object Spans {

  def duplicatedSpans(df: DataFrame, idCol: Column, textCol: Column,
                      minTokens: Int): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    val n = minTokens
    val toks = df.select(idCol.cast("long").as("doc_id"),
      split(trim(textCol), "\\s+").as("t"))
    // docs shorter than n have no seeds; the filter also keeps
    // sequence() ascending (sequence(1, 0) would count DOWN in Spark)
    val seeds = toks.where(size(col("t")) >= n)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("t")) - (n - 1)),
          i => array_join(slice(col("t"), i, lit(n)), " "))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
    val dup = seeds
      .withColumn("occ", count(lit(1)).over(Window.partitionBy("gram")))
      .where(col("occ") >= 2)
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val islands = dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wDoc) <= n, 0).otherwise(1))
      .withColumn("island", sum(col("brk")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** DuckDB twin of [[duplicatedSpans]]: identical seed grams (the
    * [[Dedup.shinglesSql]] slicing idiom), identical window count /
    * gaps-and-islands fold, integer positions throughout.
    */
  def duplicatedSpansSql(table: String, idExpr: String, textExpr: String,
                         minTokens: Int): String = {
    val n = minTokens
    s"""WITH toks AS (
       |  SELECT CAST($idExpr AS BIGINT) AS doc_id,
       |    string_split_regex(trim($textExpr), '\\s+') AS t FROM $table),
       |seeds AS (
       |  SELECT doc_id, i AS pos,
       |    array_to_string(list_slice(t, i, i + ${n - 1}), ' ') AS gram
       |  FROM (SELECT doc_id, t,
       |          unnest(range(1, greatest(len(t) - ${n - 1}, 0) + 1)) AS i
       |        FROM toks)),
       |dup AS (
       |  SELECT doc_id, pos FROM (
       |    SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS occ
       |    FROM seeds) WHERE occ >= 2),
       |isl AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM (
       |    SELECT doc_id, pos,
       |      CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |        <= $n THEN 0 ELSE 1 END AS brk
       |    FROM dup))
       |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |  CAST(max(pos) + ${n - 1} AS BIGINT) AS span_end,
       |  CAST(max(pos) + ${n - 1} - min(pos) + 1 AS BIGINT) AS span_len
       |FROM isl GROUP BY doc_id, island""".stripMargin
  }
}
