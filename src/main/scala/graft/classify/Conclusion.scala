package graft.classify

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** F7 — conclusion-section extraction
  * (`/root/reference/extract_and_embed_v2.py:188-261`): document-type-
  * specific heuristics for slicing the decision-bearing tail of a
  * judgment. "Position of last regex match" has no built-in columnar
  * equivalent, so this is a pure Scala function behind a UDF — per-row
  * string work with no state, so it still scales linearly (narrow map;
  * the UDF boundary costs serialization but no shuffle).
  */
object Conclusion {

  private val tribunalIndicators = Seq(
    """accordingly""", """in\s+result""", """the\s+appeal\s+is""", """order""",
    """final\s+order""", """for\s+these\s+reasons""", """therefore""")

  private val orderInOriginalIndicators = Seq(
    """i\s+order\s+that""", """i\s+hereby\s+order""", """hereby\s+ordered\s+that""",
    """decision""", """conclusion""", """adjudication""", """in\s+view\s+of\s+above""")

  private val genericIndicators = Seq(
    """CONCLUSION""", """DISPOSITION""", """ORDER""", """JUDGMENT""",
    """FOR THESE REASONS""", """THEREFORE""", """ACCORDINGLY""",
    """IT IS ORDERED THAT""", """IT IS SO ORDERED""", """In the result""",
    """In view of the above""")

  private val orderPhrases = Seq(
    """appeal\s+is\s+allowed""", """appeal\s+is\s+dismissed""",
    """petition\s+is\s+allowed""", """petition\s+is\s+dismissed""",
    """affirm\s+the\s+judgment""", """set\s+aside\s+the\s+order""",
    """impugned\s+order\s+is""")

  private val numberedPara = Pattern.compile("""\n\s*\d+\.\s+""")

  // compiled ONCE: extract() runs per row, and compiling the combined
  // alternation (plus up to seven order-phrase patterns) per document
  // was a measurable slice of the ingest path's CPU
  private val tribunalPattern = Pattern.compile(
    tribunalIndicators.mkString("|"), Pattern.CASE_INSENSITIVE)
  private val orderInOriginalPattern = Pattern.compile(
    orderInOriginalIndicators.mkString("|"), Pattern.CASE_INSENSITIVE)
  private val genericPattern = Pattern.compile(
    genericIndicators.mkString("|"), Pattern.CASE_INSENSITIVE)
  private val orderPhrasePatterns =
    orderPhrases.map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))

  private def lastMatchStart(p: Pattern, text: String): Option[Int] = {
    val m = p.matcher(text)
    var last = -1
    while (m.find()) last = m.start()
    if (last >= 0) Some(last) else None
  }

  /** Direct transcription of `extract_conclusion_section`. */
  def extract(text: String, documentType: String = "generic_legal_document"): String = {
    val pattern = documentType match {
      case "appellate_tribunal" =>
        // tribunal docs: prefer the last 3 numbered paragraphs (emb_v2:200-204)
        val starts = {
          val m = numberedPara.matcher(text)
          val buf = scala.collection.mutable.ArrayBuffer[Int]()
          while (m.find()) buf += m.start()
          buf
        }
        if (starts.length > 2) return text.substring(starts(starts.length - 3))
        tribunalPattern
      case "order_in_original" => orderInOriginalPattern
      case _                   => genericPattern
    }

    // last indicator match → +2000 chars (emb_v2:222-233)
    lastMatchStart(pattern, text) match {
      case Some(start) =>
        return text.substring(start, math.min(text.length, start + 2000))
      case None =>
    }

    // order phrases → ±500 chars of context (emb_v2:236-249)
    for (phrase <- orderPhrasePatterns) {
      val m = phrase.matcher(text)
      if (m.find()) {
        val start = math.max(0, m.start() - 500)
        val end   = math.min(text.length, m.end() + 500)
        return text.substring(start, end)
      }
    }

    // positional fallbacks (emb_v2:252-261)
    if (text.length > 5000) text.substring((text.length * 0.8).toInt)
    else if (text.length > 1000) text.substring(text.length - 1000)
    else text
  }

  private val extractUdf = udf((text: String, docType: String) =>
    if (text == null) null else extract(text, if (docType == null) "generic_legal_document" else docType))

  def extractCol(text: Column, docType: Column): Column = extractUdf(text, docType)

  // ---- DuckDB oracle twin -------------------------------------------

  /** DuckDB rendering of [[extract]] over a text expression `t` and a
    * document-type expression `dt`.
    *
    * "Position of the last regex match" has no DuckDB built-in either,
    * so positions are RECONSTRUCTED from the two lists DuckDB does
    * give: with `m = regexp_extract_all(t, p)` (the matches, in order)
    * and `s = string_split_regex(t, p)` (the text between them),
    * `t = s[1] ‖ m[1] ‖ s[2] ‖ … ‖ m[n] ‖ s[n+1]`, so the suffix from
    * the start of the k-th-from-last match is just the tail of that
    * interleaving — list ops, no positions needed. First-match offsets
    * (the ±500-context branch) come from `length(s[1])`. Both engines
    * run leftmost-first alternation (Java regex; RE2 non-POSIX), and
    * case-insensitivity travels as an inline `(?i)` group, so match
    * boundaries agree; offsets agree in ASCII (the fixture contract —
    * DuckDB counts code points in `length`/`substr` too, so this also
    * holds for non-ASCII, unlike levenshtein).
    */
  def extractSql(t: String, dt: String): String = {
    import graft.oracle.Sql.lit
    def ci(pats: Seq[String]): String = "(?i)(?:" + pats.mkString("|") + ")"
    val num = """\n\s*\d+\.\s+"""

    def lastSuffix(p: String): String =
      s"(list_last(regexp_extract_all($t, ${lit(p)})) || list_last(string_split_regex($t, ${lit(p)})))"

    def positional: String =
      s"CASE WHEN length($t) > 5000 THEN substr($t, CAST(trunc(length($t) * 0.8) AS BIGINT) + 1) " +
        s"WHEN length($t) > 1000 THEN substr($t, length($t) - 999) ELSE $t END"

    def ctx(p: String): String = {
      val start0 = s"length(list_extract(string_split_regex($t, ${lit(p)}), 1))"
      val m0len  = s"length(regexp_extract($t, ${lit(p)}))"
      val st     = s"greatest(0, $start0 - 500)"
      val en     = s"least(length($t), $start0 + $m0len + 500)"
      s"substr($t, $st + 1, $en - ($st))"
    }

    val phraseChain = {
      val whens = orderPhrases.map { p =>
        val cp = ci(Seq(p))
        s"WHEN regexp_matches($t, ${lit(cp)}) THEN ${ctx(cp)}"
      }
      s"CASE ${whens.mkString(" ")} ELSE $positional END"
    }

    def indicatorChain(pats: Seq[String]): String = {
      val p = ci(pats)
      s"CASE WHEN regexp_matches($t, ${lit(p)}) THEN substr(${lastSuffix(p)}, 1, 2000) " +
        s"ELSE $phraseChain END"
    }

    val tribunal3 = {
      val m = s"regexp_extract_all($t, ${lit(num)})"
      val s2 = s"string_split_regex($t, ${lit(num)})"
      val suffix = s"($m[-3] || $s2[-3] || $m[-2] || $s2[-2] || $m[-1] || $s2[-1])"
      s"CASE WHEN len($m) > 2 THEN $suffix ELSE ${indicatorChain(tribunalIndicators)} END"
    }

    s"CASE WHEN $dt = 'appellate_tribunal' THEN $tribunal3 " +
      s"WHEN $dt = 'order_in_original' THEN ${indicatorChain(orderInOriginalIndicators)} " +
      s"ELSE ${indicatorChain(genericIndicators)} END"
  }
}
