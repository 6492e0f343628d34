package graft.classify

/** The reference's regex rule tables as data. One source of truth feeds
  * both the Spark Column cascade and the DuckDB oracle SQL (see
  * [[Cascades]]), so engine and oracle can never drift.
  *
  * Patterns are transcribed verbatim from the reference (Python `re`);
  * every pattern here is dialect-portable across Python re, Java regex
  * (Spark `rlike`) and RE2 (DuckDB `regexp_matches`): `\s+`
  * alternation, and literal text only. The one normalization: Python
  * `hon\'ble` → `hon'ble` (identical regex semantics; `\'` is just an
  * escaped quote).
  */
object DecisionRules {
  val Won     = "appellant_won"
  val Lost    = "appellant_lost"
  val Invalid = "invalid"

  /** C1 case-decision cascade — ordered, first-match-wins. Transcribed
    * from the regex-only authority `/root/reference/extract_and_search_v2.py:173-232`
    * (identical prefix in `extract_and_embed_v2.py:87-143`). Rule order
    * is semantic: `appeal is allowed` (won) precedes `appeal dismissed`
    * (lost); remand counts as a win.
    */
  val decisionCascade: Seq[(Seq[String], String)] = Seq(
    // customs appeal tribunal phrases (search_v2:179-183)
    (Seq("""appeal\s+is\s+allowed""", """the\s+appeal\s+is\s+allowed\s+by\s+way\s+of"""), Won),
    (Seq("""impugned\s+order\s+is\s+set-aside""", """impugned\s+order\s+is\s+set\s+aside"""), Won),
    // remand outcomes = partial wins (search_v2:186-187)
    (Seq("""remand\s+to\s+the\s+commissioner""", """matter\s+needs\s+to\s+be\s+remanded"""), Won),
    // standard outcome statements (search_v2:190-200)
    (Seq("""appeal\s+dismissed""", """dismiss\s+the\s+appeal"""), Lost),
    (Seq("""appeal\s+allowed""", """allow\s+the\s+appeal"""), Won),
    (Seq("""judgment\s+affirmed""", """affirm\s+the\s+judgment"""), Lost),
    (Seq("""judgment\s+reversed""", """reverse\s+the\s+judgment"""), Won),
    // order outcomes (search_v2:203-204)
    (Seq("""order\s+is\s+upheld""", """upheld\s+the\s+order"""), Lost),
    // rejection/acceptance (search_v2:207-211)
    (Seq("""refund\s+claim\s+is\s+rejected""", """petition\s+is\s+rejected"""), Lost),
    (Seq("""refund\s+claim\s+is\s+accepted""", """petition\s+is\s+accepted"""), Won),
    // win-indicator list (search_v2:214-229)
    (Seq(
      """in\s+favor\s+of\s+appellant""",
      """appellant\s+prevails""",
      """grant\s+the\s+appeal""",
      """succeed\s+on\s+appeal""",
      """appeal\s+is\s+successful""",
      """judgment\s+set\s+aside""",
      """order\s+set\s+aside""",
      """appeal\s+is\s+partly\s+allowed""",
      """relief\s+granted""",
      """relief\s+is\s+granted"""), Won),
  )

  /** C2 document-type detection (`extract_and_embed_v2.py:162-185`). */
  val docTypeCascade: Seq[(Seq[String], String)] = Seq(
    (Seq("""appellate tribunal|cestat|final order no|coram|hon'ble"""), "appellate_tribunal"),
    (Seq("""order-in-original|commissioner of customs|central board of indirect taxes|office of the commissioner"""), "order_in_original"),
    (Seq("""high court|writ petition|division bench|single bench"""), "high_court"),
    (Seq("""supreme court|civil appeal no|criminal appeal no|constitution bench"""), "supreme_court"),
  )
  val GenericDocType = "generic_legal_document"

  /** C3 document-context label (`extract_and_embed_v2.py:302-320`). */
  val docContextCascade: Seq[(Seq[String], String)] = Seq(
    (Seq("""customs|cestat|excise|service tax|appellate tribunal"""), "a Customs/Tax Appellate Tribunal case"),
    (Seq("""writ petition|high court"""), "a High Court judgment"),
    (Seq("""supreme court|civil appeal|criminal appeal"""), "a Supreme Court judgment"),
    (Seq("""commissioner|order-in-original|central board"""), "an administrative order from a tax/customs authority"),
  )
  val GenericDocContext = "a legal document"
}
