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

  private def lastMatchStart(p: Pattern, text: String): Option[Int] = {
    val m = p.matcher(text)
    var last = -1
    while (m.find()) last = m.start()
    if (last >= 0) Some(last) else None
  }

  /** Direct transcription of `extract_conclusion_section`. */
  def extract(text: String, documentType: String = "generic_legal_document"): String = {
    val indicators = documentType match {
      case "appellate_tribunal" =>
        // tribunal docs: prefer the last 3 numbered paragraphs (emb_v2:200-204)
        val starts = {
          val m = numberedPara.matcher(text)
          val buf = scala.collection.mutable.ArrayBuffer[Int]()
          while (m.find()) buf += m.start()
          buf
        }
        if (starts.length > 2) return text.substring(starts(starts.length - 3))
        tribunalIndicators
      case "order_in_original" => orderInOriginalIndicators
      case _                   => genericIndicators
    }

    // last indicator match → +2000 chars (emb_v2:222-233)
    val pattern = Pattern.compile(indicators.mkString("|"), Pattern.CASE_INSENSITIVE)
    lastMatchStart(pattern, text) match {
      case Some(start) =>
        return text.substring(start, math.min(text.length, start + 2000))
      case None =>
    }

    // order phrases → ±500 chars of context (emb_v2:236-249)
    for (phrase <- orderPhrases) {
      val m = Pattern.compile(phrase, Pattern.CASE_INSENSITIVE).matcher(text)
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
}
