package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.oracle.Sql

/** Deterministic fixture enrichment for the correctness gate.
  *
  * The harness `documents.text` is lowercase word-salad over a 31-word
  * vocabulary — no legal phrases, no punctuation — so every regex
  * cascade would emit its default label and the oracle compare would
  * prove nothing. These helpers append/prepend marker phrases keyed on
  * `doc_id` (identically on the Spark and DuckDB sides, rendered from
  * the same phrase lists), so each cascade branch — including the
  * order-sensitive ones — is exercised with varied output. None of the
  * phrases can collide with the base vocabulary.
  */
object Enrich {

  /** Covers C1 branches: rules 1–3 (won), 4 (lost), an ordering probe
    * (index 4: contains both a lost-rule and an earlier won-rule
    * pattern — must classify won), rules 5–10, a win-indicator, and a
    * no-match slot (invalid).
    */
  val decisionPhrases: Seq[String] = Seq(
    "the appeal is allowed by way of remand",
    "the impugned order is set aside",
    "the matter needs to be remanded",
    "appeal dismissed",
    "appeal dismissed but on review the appeal is allowed",
    "we allow the appeal",
    "judgment affirmed",
    "the order is upheld",
    "the petition is rejected",
    "relief is granted",
    "")

  /** Covers C2 branches + an ordering probe (index 4: high_court and
    * appellate_tribunal markers together — tribunal rule fires first).
    */
  val docTypePhrases: Seq[String] = Seq(
    "before the appellate tribunal",
    "order-in-original issued by the commissioner of customs",
    "writ petition before the division bench",
    "civil appeal no 123 before the constitution bench",
    "in the high court cestat matter",
    "")

  /** Scrub-pass fixture (the word-salad corpus contains no emails,
    * URLs, or digit runs): one phrase per redaction class, one mixing
    * all three (ordering probe — the email's digits and the URL's
    * digits must survive as part of their placeholders, not become
    * `<NUM>`), one with a SHORT digit run that must NOT be redacted,
    * and a no-op slot.
    */
  val piiPhrases: Seq[String] = Seq(
    "contact alice.smith+tag@example-mail.com for details",
    "see https://example.com/path?q=123456789 and report back",
    "account 9876543210 was flagged",
    "mail bob99@test.org or visit http://foo.example/y8k then cite 112233445566",
    "only 12345 here",
    "")

  /** Covers C3 branches. */
  val docContextPhrases: Seq[String] = Seq(
    "central excise duty dispute",
    "service tax demand notice",
    "writ petition filed today",
    "criminal appeal lodged herein",
    "order of the commissioner impugned",
    "")

  /** Pick `phrases(key % n)` as a Column. */
  def phrase(key: Column, phrases: Seq[String]): Column = {
    val n = phrases.size
    phrases.zipWithIndex.init.foldRight(lit(phrases.last): Column) {
      case ((p, i), acc) => when(pmod(key, lit(n)) === i, lit(p)).otherwise(acc)
    }
  }

  def phraseSql(keyExpr: String, phrases: Seq[String]): String = {
    val n = phrases.size
    val whens = phrases.zipWithIndex.init
      .map { case (p, i) => s"WHEN $i THEN ${Sql.lit(p)}" }
    s"CASE ($keyExpr) % $n ${whens.mkString(" ")} ELSE ${Sql.lit(phrases.last)} END"
  }

  /** `text + " " + phrases(key % n)`. */
  def inject(text: Column, key: Column, phrases: Seq[String]): Column =
    concat(text, lit(" "), phrase(key, phrases))

  def injectSql(textExpr: String, keyExpr: String, phrases: Seq[String]): String =
    s"($textExpr || ' ' || (${phraseSql(keyExpr, phrases)}))"

  /** Dedup fixture: plants exact-duplicate and near-duplicate classes
    * among doc_id % 7 ∈ {0, 1} rows; all other rows keep their (unique)
    * fixture text. Classes are keyed on `doc_id / 70` blocks so each
    * class holds ~10 members *at any table size* — class sizes (and
    * hence verified-pair counts) scale linearly with the corpus, never
    * quadratically.
    */
  private def blockId(key: Column): Column =
    floor(key.cast("double") / 70.0).cast("long")
  private def blockIdSql(keyExpr: String): String =
    s"CAST(floor(($keyExpr) / 70.0) AS BIGINT)"

  /** Paragraph-dedup fixture: lays every document out as four
    * paragraphs — a corpus-wide boilerplate header (duplicated in
    * EVERY document: the nav-bar/cookie-banner case), a unique body
    * slice, a per-block shared footer (duplicated within each ~70-doc
    * [[blockId]] block), and a second unique body slice. Documents
    * `key % 11 == 0` additionally consist ONLY of boilerplate (header
    * + footer), exercising the every-paragraph-dropped branch.
    */
  def boilerplated(text: Column, key: Column): Column = {
    val header = lit("subscribe to our newsletter for the latest updates")
    val footer = concat(lit("shared footer block "), blockId(key).cast("string"))
    when(pmod(key, lit(11)) === 0, concat_ws("\n\n", header, footer))
      .otherwise(concat_ws("\n\n",
        header, substring(text, 1, 150), footer,
        substring(text, 151, 100000)))
  }

  def boilerplatedSql(textExpr: String, keyExpr: String): String = {
    val sep = "chr(10)||chr(10)"
    val header = "'subscribe to our newsletter for the latest updates'"
    val footer = s"'shared footer block ' || CAST(${blockIdSql(keyExpr)} AS VARCHAR)"
    s"""CASE WHEN ($keyExpr) % 11 = 0
       | THEN concat_ws($sep, $header, $footer)
       | ELSE concat_ws($sep, $header, substr($textExpr, 1, 150), $footer,
       |        substr($textExpr, 151, 100000)) END""".stripMargin
  }

  /** C4-rule fixture: lays each document out as web-page-ish lines so
    * every C4 rule fires somewhere in the corpus. Lines 1 and 3 are
    * punctuated slices of the real text (kept; line 3 carries three
    * sentence terminals), line 2 is under the 3-word floor, line 4
    * mentions javascript on every 7th doc (its loss drops the page
    * under the 5-sentence gate), line 5 is the unpunctuated remainder
    * (line-dropped), and every 13th/17th doc plants the page-level
    * "lorem ipsum" / curly-brace poison. `concat_ws` skips the NULL
    * branches on both engines.
    */
  def c4Mixed(text: Column, key: Column): Column = {
    val l1 = concat(substring(text, 1, 100), lit(" end one."))
    val l2 = lit("too short.")
    val l3 = concat(substring(text, 101, 100),
      lit(" end two! end three? end four."))
    val l4 = when(pmod(key, lit(7)) === 0, lit("javascript needs to go away."))
      .otherwise(lit("clean closing line here."))
    val l5 = substring(text, 201, 100000)
    val l6 = when(pmod(key, lit(13)) === 0, lit("lorem ipsum dolor sit."))
    val l7 = when(pmod(key, lit(17)) === 0, lit("brace { sample."))
    concat_ws("\n", l1, l2, l3, l4, l5, l6, l7)
  }

  def c4MixedSql(textExpr: String, keyExpr: String): String =
    s"""concat_ws(chr(10),
       | substr($textExpr, 1, 100) || ' end one.',
       | 'too short.',
       | substr($textExpr, 101, 100) || ' end two! end three? end four.',
       | CASE WHEN ($keyExpr) % 7 = 0 THEN 'javascript needs to go away.'
       |      ELSE 'clean closing line here.' END,
       | substr($textExpr, 201, 100000),
       | CASE WHEN ($keyExpr) % 13 = 0 THEN 'lorem ipsum dolor sit.' END,
       | CASE WHEN ($keyExpr) % 17 = 0 THEN 'brace { sample.' END)""".stripMargin

  // ---- Gopher-rule fixture --------------------------------------------

  // building blocks shared by the Column and SQL renderings — each
  // variant targets ONE rule (the others hold at their thresholds)
  private val gStopPack = "the be to of and that have with"
  private val gPad: String = (0 until 60).map(i => "pad" + i).mkString(" ")
  private val gSymbolDoc: String =
    ((0 until 53).map(i => "pad" + i) ++ Seq.fill(7)("#")).mkString(" ") +
      " " + gStopPack // 7/68 symbols > 0.1; alpha 61/68 ≥ 0.8 still passes
  private val gLongDoc: String =
    Seq.fill(60)("abcdefghijklmnop").mkString(" ") + " " + gStopPack
  private val gNumericDoc: String =
    ((0 until 40).map(i => "pad" + i) ++ Seq.fill(15)("12345")).mkString(" ") +
      " " + gStopPack // alpha 48/63 < 0.8; symbol ratio stays 0
  private val gTinyDoc = "tiny doc of the and"

  /** Gopher-rule fixture: the word-salad corpus is single-line
    * all-alpha text whose only required stopword is `the`, so untouched
    * it exercises exactly one failure mode. Variants keyed on
    * `key % 8`: 0 passes every rule; 1 fails min word count; 2 fails
    * the bullet-line rule; 3 the ellipsis-line rule; 4 the symbol
    * ratio; 5 the mean-word-length cap; 6 the alpha-word fraction;
    * 7 the required-stopword floor (base text + padding only).
    */
  def gopherContent(text: Column, key: Column): Column = {
    val passing = concat(text, lit(" " + gStopPack + " " + gPad))
    when(pmod(key, lit(8)) === 0, passing)
      .when(pmod(key, lit(8)) === 1, lit(gTinyDoc))
      .when(pmod(key, lit(8)) === 2, concat(lit("- "), passing))
      .when(pmod(key, lit(8)) === 3, concat(passing, lit(" trailing off...")))
      .when(pmod(key, lit(8)) === 4, lit(gSymbolDoc))
      .when(pmod(key, lit(8)) === 5, lit(gLongDoc))
      .when(pmod(key, lit(8)) === 6, lit(gNumericDoc))
      .otherwise(concat(text, lit(" " + gPad)))
  }

  def gopherContentSql(textExpr: String, keyExpr: String): String = {
    val passing = s"($textExpr || ${Sql.lit(" " + gStopPack + " " + gPad)})"
    s"""CASE ($keyExpr) % 8
       | WHEN 0 THEN $passing
       | WHEN 1 THEN ${Sql.lit(gTinyDoc)}
       | WHEN 2 THEN '- ' || $passing
       | WHEN 3 THEN $passing || ' trailing off...'
       | WHEN 4 THEN ${Sql.lit(gSymbolDoc)}
       | WHEN 5 THEN ${Sql.lit(gLongDoc)}
       | WHEN 6 THEN ${Sql.lit(gNumericDoc)}
       | ELSE ($textExpr || ${Sql.lit(" " + gPad)}) END""".stripMargin
  }

  /** Id stride the 10× scale fixture offsets copies by
    * ([[graft.tools.ScaleData]]): keys below it are the harness corpus
    * proper (copy 0), keys at or above it belong to a synthesized
    * copy. The dup-phrase templates below namespace PER COPY past the
    * stride — without it, every copy shares the template vocabulary
    * ("alpha beta gamma…"), shingle candidates collide ACROSS copies,
    * and the cluster family's 10× ratios read ~99× candidate growth
    * that a real 10× corpus would not have. Harness keys are all
    * copy 0, so the DuckDB twins (which only ever see the harness
    * tables) are unchanged.
    */
  private val CopyStride = 100000000L

  private def copyOf(key: Column): Column =
    floor(key.cast("double") / CopyStride.toDouble).cast("long")

  /** Suffix every token of `phrase` with the copy namespace (identity
    * on copy 0 — the gate-visible corpus).
    */
  private def nsPhrase(phrase: Column, key: Column): Column = {
    val c = copyOf(key)
    when(c === 0, phrase)
      .otherwise(regexp_replace(phrase, lit("(\\S+)"),
        concat(lit("$1_q"), c.cast("string"))))
  }

  def dedupContent(text: Column, key: Column): Column =
    when(pmod(key, lit(7)) === 0,
      nsPhrase(concat(lit("dup block exact "), blockId(key).cast("string"),
        lit(" alpha beta gamma delta epsilon zeta eta theta")), key))
      .when(pmod(key, lit(7)) === 1,
        // block id interleaved through the shared run so shingles
        // straddling it differ across blocks (cross-block Jaccard ≈ 0.2,
        // below threshold); within a block, variants differ only in the
        // trailing token (Jaccard ≈ 0.87, above threshold)
        nsPhrase(concat(lit("near block "), blockId(key).cast("string"),
          lit(" shared one two three "), blockId(key).cast("string"),
          lit(" four five six seven "), blockId(key).cast("string"),
          lit(" eight nine ten tail"), pmod(key, lit(2)).cast("string")), key))
      .otherwise(text)

  def dedupContentSql(textExpr: String, keyExpr: String): String =
    s"""CASE WHEN ($keyExpr) % 7 = 0
       | THEN 'dup block exact ' || CAST(${blockIdSql(keyExpr)} AS VARCHAR) || ' alpha beta gamma delta epsilon zeta eta theta'
       | WHEN ($keyExpr) % 7 = 1
       | THEN 'near block ' || CAST(${blockIdSql(keyExpr)} AS VARCHAR) || ' shared one two three ' || CAST(${blockIdSql(keyExpr)} AS VARCHAR) || ' four five six seven ' || CAST(${blockIdSql(keyExpr)} AS VARCHAR) || ' eight nine ten tail' || CAST(($keyExpr) % 2 AS VARCHAR)
       | ELSE $textExpr END""".stripMargin

  /** SimHash-pair fixture. The word-salad `text` column draws on a
    * 31-word vocabulary, so long documents have near-identical token
    * DISTRIBUTIONS — and SimHash, being a distribution sketch,
    * correctly lands ~3000 of the sf0.01 pairs within Hamming
    * distance 3 (measured). That is the honest scale lesson (SimHash
    * cannot separate a low-entropy corpus), but it makes the pair set
    * un-predictable in SQL. For the oracle gate we synthesize content
    * that is actually far apart: 16 pseudo-random tokens per document
    * from a ~100k vocabulary (affine hash mod a prime — identical
    * arithmetic in Spark and DuckDB), with `doc_id % 7 == 0` rows
    * collapsed into per-block exact-duplicate classes whose shared
    * tokens are seeded from the block id (so distinct classes are
    * ALSO far apart). Every pair within Hamming ≤ 3 is then an
    * identical-content pair, a set DuckDB can enumerate by fingerprint
    * equality.
    */
  def simhashContent(key: Column): Column = {
    def tok(prefix: String, seed: Column, i: Int, a: Long, b: Long, p: Long) =
      concat(lit(if (i == 0) prefix else " " + prefix),
        pmod(seed * a + lit(i * b), lit(p)).cast("string"))
    val uniq = (0 until 16).map(i => tok("w", key, i, 2654435761L, 40503L, 100003L))
    val dup  = (0 until 12).map(i => tok("d", blockId(key), i, 7919L, 104729L, 99991L))
    when(pmod(key, lit(7)) === 0, concat(dup: _*))
      .otherwise(concat(uniq: _*))
  }

  def simhashContentSql(keyExpr: String): String = {
    def tok(prefix: String, seed: String, i: Int, a: Long, b: Long, p: Long) =
      s"'${if (i == 0) prefix else " " + prefix}' || CAST((($seed) * $a + ${i.toLong * b}) % $p AS VARCHAR)"
    val uniq = (0 until 16).map(i => tok("w", keyExpr, i, 2654435761L, 40503L, 100003L)).mkString(" || ")
    val dup  = (0 until 12).map(i => tok("d", blockIdSql(keyExpr), i, 7919L, 104729L, 99991L)).mkString(" || ")
    s"CASE WHEN ($keyExpr) % 7 = 0 THEN $dup ELSE $uniq END"
  }

  /** Containment fixture: `key % 7 == 0` documents are a 12-token
    * "core" run seeded by the block id; `key % 7 == 1` documents are
    * that SAME core followed by 24 key-salted unique tokens. Within a
    * block, (core, extended) pairs have core-side containment exactly
    * 1.0 — every core shingle reappears verbatim in the extension —
    * while Jaccard sits near 10/34 ≈ 0.29, the asymmetric-duplicate
    * shape a symmetric threshold can never pass. All other documents
    * are 16 high-entropy tokens (distinct prefix namespaces keep the
    * classes shingle-disjoint), so the qualifying pair set is exactly
    * the planted one on both engines.
    */
  def containmentContent(key: Column): Column = {
    def tok(prefix: String, seed: Column, i: Int, a: Long, b: Long, p: Long) =
      concat(lit(if (i == 0) prefix else " " + prefix),
        pmod(seed * a + lit(i * b), lit(p)).cast("string"))
    val core = (0 until 12).map(i => tok("c", blockId(key), i, 7919L, 104729L, 99991L))
    val ext  = (0 until 24).map(i => tok("u", key, i, 2654435761L, 40503L, 100003L))
    val salad = (0 until 16).map(i => tok("w", key, i, 1299709L, 15485863L, 100003L))
    when(pmod(key, lit(7)) === 0, concat(core: _*))
      .when(pmod(key, lit(7)) === 1, concat(concat(core: _*), lit(" "), concat(ext: _*)))
      .otherwise(concat(salad: _*))
  }

  def containmentContentSql(keyExpr: String): String = {
    def tok(prefix: String, seed: String, i: Int, a: Long, b: Long, p: Long) =
      s"'${if (i == 0) prefix else " " + prefix}' || CAST((($seed) * $a + ${i.toLong * b}) % $p AS VARCHAR)"
    val core = (0 until 12).map(i => tok("c", blockIdSql(keyExpr), i, 7919L, 104729L, 99991L)).mkString(" || ")
    val ext  = (0 until 24).map(i => tok("u", keyExpr, i, 2654435761L, 40503L, 100003L)).mkString(" || ")
    val salad = (0 until 16).map(i => tok("w", keyExpr, i, 1299709L, 15485863L, 100003L)).mkString(" || ")
    s"""CASE WHEN ($keyExpr) % 7 = 0 THEN $core
       | WHEN ($keyExpr) % 7 = 1 THEN $core || ' ' || $ext
       | ELSE $salad END""".stripMargin
  }

  /** S2 fixture: a first-page-style header (case number, parties, two
    * date formats, mixed case) prepended to the document text.
    */
  def withHeader(text: Column, key: Column): Column =
    concat(lit("Appeal No. C/"), pmod(key, lit(900)).cast("string"),
      lit("/2012 Alpha Corp versus Beta Ltd 29-03-2023 heard 1st Apr 2023 "), text)

  def withHeaderSql(textExpr: String, keyExpr: String): String =
    s"('Appeal No. C/' || CAST(($keyExpr) % 900 AS VARCHAR) || " +
      s"'/2012 Alpha Corp versus Beta Ltd 29-03-2023 heard 1st Apr 2023 ' || $textExpr)"

  /** Language-marker injection: appends each language's markers three
    * times for the document's labelled `lang`, so content-based langid
    * can recover the label.
    */
  def withLangMarkers(text: Column, lang: Column,
                      markers: Seq[(String, Seq[String])]): Column = {
    val markerFor = markers.init.foldRight(lit(markers.last._2.mkString(" ")): Column) {
      case ((l, ms), acc) => when(lang === l, lit(ms.mkString(" "))).otherwise(acc)
    }
    concat(text, lit(" "), markerFor, lit(" "), markerFor, lit(" "), markerFor)
  }

  def withLangMarkersSql(textExpr: String, langExpr: String,
                         markers: Seq[(String, Seq[String])]): String = {
    val whens = markers.init.map { case (l, ms) =>
      s"WHEN ${Sql.lit(l)} THEN ${Sql.lit(ms.mkString(" "))}"
    }
    val m = s"(CASE $langExpr ${whens.mkString(" ")} ELSE ${Sql.lit(markers.last._2.mkString(" "))} END)"
    s"($textExpr || ' ' || $m || ' ' || $m || ' ' || $m)"
  }
}
