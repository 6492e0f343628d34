package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (Muthitacharoen, Chen & Mazieres 2001,
  * LBFS; the rsync rolling-checksum idea) — boundaries decided by the
  * text itself
  * (a rolling window hash hitting a residue class), not by fixed
  * offsets. The property that matters for dedup pipelines: an edit
  * only moves the boundaries inside its own neighborhood, so two
  * near-identical documents still produce mostly IDENTICAL chunks
  * (identical md5s) — where fixed-stride chunking shifts every chunk
  * after the edit and kills downstream chunk-level dedup. This is the
  * rsync/LBFS boundary trick restated as a Spark projection.
  *
  * Boundary rule: position i (1-based, i ≥ W) ends a chunk when the
  * base-31 polynomial hash of the trailing W=8 characters is ≡ 0
  * mod `modulus` — so chunks average `modulus` chars on random text,
  * with hard determinism: the hash is an exact-integer left fold
  * (≤ 65535·31⁷ ≪ 2⁶³), replayed in DuckDB as a power-weighted sum
  * with BIGINT literal coefficients — no floats anywhere. Character
  * unit is the code point (both engines' substr/ord agree through the
  * BMP; the gate fixture is ASCII — same contract as the levenshtein
  * tier).
  *
  * Scale shape: one narrow projection per document (higher-order
  * functions, O(W·len) work, no shuffle) followed by one generator —
  * corpus chunks never pass through an exchange. Empty documents emit
  * nothing; documents shorter than W are one whole-document chunk.
  */
object Cdc {

  val Window = 8

  /** (id, chunk_idx, start, chunk_len, chunk_md5) per content-defined
    * chunk. `start` is 1-based; `chunk_md5` hashes the chunk text.
    */
  def cdcChunks(df: DataFrame, idCol: Column, textCol: Column,
                modulus: Int = 64): DataFrame = {
    require(modulus > 0, s"modulus must be positive, got $modulus")
    val t = col("__cdc_t")
    // Per-position work must be O(W) ARRAY lookups, not O(W) substr
    // calls: UTF8 substr seeks from the string start, which makes the
    // naive form O(W·len²) per document (measured 13s over the sf0.1
    // corpus vs 1s this way). One split+transform materializes the
    // code points; element_at is O(1) on the primitive array, and the
    // power-weighted sum is the identical integer value as the fold.
    val powers = (0 until Window).map(k =>
      math.pow(31.0, Window - 1 - k).toLong)
    def hashAt(p: Column): Column =
      (0 until Window).map { k =>
        element_at(col("__codes"), (p - (Window - 1 - k)).cast("int")) *
          lit(powers(k))
      }.reduce(_ + _)
    val base = df.select(idCol.as("id"), textCol.as("__cdc_t"))
      .where(t.isNotNull && length(t) > 0)
      .withColumn("__codes",
        transform(split(t, ""), c => ascii(c).cast("long")))
      .withColumn("__len", length(t).cast("long"))
      // candidate boundary positions W..len (guard: sequence(a, b)
      // runs DESCENDING when a > b — short docs must yield no
      // candidates, not a reversed range)
      .withColumn("__bpos",
        when(col("__len") >= Window,
          filter(sequence(lit(Window.toLong), col("__len")),
            p => hashAt(p) % modulus === 0L))
          .otherwise(array().cast("array<bigint>")))
      .withColumn("__starts",
        concat(array(lit(1L)), transform(col("__bpos"), p => p + 1L)))
      .withColumn("__ends", concat(col("__bpos"), array(col("__len"))))
    base.select(col("id"), col("__cdc_t"),
        posexplode(arrays_zip(col("__starts"), col("__ends"))))
      .select(col("id"), col("pos").as("chunk_idx"),
        col("col.__starts").as("start"),
        (col("col.__ends") - col("col.__starts") + 1L).as("chunk_len"),
        md5(substr(col("__cdc_t"), col("col.__starts"),
          col("col.__ends") - col("col.__starts") + 1L)).as("chunk_md5"))
      // a boundary on the final character leaves an empty tail pair —
      // only ever the LAST pair, so chunk_idx stays contiguous
      .where(col("chunk_len") > 0L)
  }

  /** DuckDB twin of [[cdcChunks]]. */
  def cdcChunksSql(table: String, idExpr: String, textExpr: String,
                   modulus: Int = 64): String = {
    // 31^(W-1-k) as BIGINT literals: the exact-integer replay of the
    // Spark side's left fold
    val powers = (0 until Window).map(k => math.pow(31.0, Window - 1 - k).toLong)
    // CAST both factors: DuckDB's ord() and small power literals are
    // INT32, and INT32×INT32 overflows where the Spark fold is long
    val hash = (0 until Window).map { k =>
      s"CAST(ord(substr(t, CAST(p AS INT) - ${Window - 1 - k}, 1)) AS BIGINT)" +
        s" * CAST(${powers(k)} AS BIGINT)"
    }.mkString(" + ")
    s"""WITH src AS (
       |  SELECT $idExpr AS id, $textExpr AS t,
       |    CAST(length($textExpr) AS BIGINT) AS len
       |  FROM $table
       |  WHERE $textExpr IS NOT NULL AND length($textExpr) > 0
       |), marked AS (
       |  SELECT id, t, len,
       |    list_filter(range($Window, len + 1), p -> ($hash) % $modulus = 0)
       |      AS bpos
       |  FROM src
       |), pieces AS (
       |  SELECT id, t, len,
       |    list_concat([CAST(1 AS BIGINT)], list_transform(bpos, p -> p + 1))
       |      AS starts,
       |    list_concat(bpos, [len]) AS ends
       |  FROM marked
       |), exploded AS (
       |  SELECT id, t, starts, ends,
       |    CAST(unnest(range(1, len(starts) + 1)) AS INT) AS j
       |  FROM pieces
       |)
       |SELECT id, j - 1 AS chunk_idx, starts[j] AS start,
       |  ends[j] - starts[j] + 1 AS chunk_len,
       |  md5(substr(t, CAST(starts[j] AS INT),
       |    CAST(ends[j] - starts[j] + 1 AS INT))) AS chunk_md5
       |FROM exploded
       |WHERE ends[j] - starts[j] + 1 > 0""".stripMargin
  }
}
