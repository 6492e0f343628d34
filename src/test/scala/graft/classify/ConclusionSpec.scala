package graft.classify

import org.scalatest.funsuite.AnyFunSuite

/** Pins F7 branch semantics (`extract_conclusion_section`,
  * /root/reference/extract_and_embed_v2.py:188-261).
  */
class ConclusionSpec extends AnyFunSuite {

  test("tribunal docs slice from the 3rd-to-last numbered paragraph") {
    val text = "intro\n 1. first\n 2. second\n 3. third\n 4. fourth\n 5. order"
    val out  = Conclusion.extract(text, "appellate_tribunal")
    assert(out == "\n 3. third\n 4. fourth\n 5. order")
  }

  test("tribunal docs with <3 numbered paragraphs fall back to indicators") {
    val text = "intro\n 1. only one numbered para therefore we decide x" + ("pad " * 10)
    val out  = Conclusion.extract(text, "appellate_tribunal")
    // last indicator match is "therefore" (case-insensitive)
    assert(out.startsWith("therefore"))
  }

  test("generic docs slice from the LAST indicator match, +2000 chars") {
    val text = "CONCLUSION early text " + ("x " * 50) + "CONCLUSION final verdict"
    val out  = Conclusion.extract(text, "generic_legal_document")
    assert(out == "CONCLUSION final verdict")
  }

  test("indicator window caps at 2000 chars") {
    val text = "JUDGMENT " + ("y " * 3000)
    val out  = Conclusion.extract(text, "generic_legal_document")
    assert(out.length == 2000 && out.startsWith("JUDGMENT"))
  }

  test("order phrases give ±500 chars of context") {
    val pad  = "z" * 600
    val text = pad + " the appeal is allowed " + pad
    val out  = Conclusion.extract(text, "generic_legal_document")
    // no generic indicator matches; order-phrase match spans
    // "appeal is allowed" (17 chars) → window = 500 + 17 + 500
    assert(out.length == 500 + "appeal is allowed".length + 500)
    assert(out.contains("the appeal is allowed"))
  }

  test("long documents (>5000 chars) fall back to the last 20%") {
    val text = "q" * 6000
    assert(Conclusion.extract(text) == "q" * (6000 - 4800))
  }

  test("medium documents (>1000 chars) fall back to the last 1000") {
    val text = "r" * 1500
    assert(Conclusion.extract(text) == "r" * 1000)
  }

  test("short documents return whole text") {
    assert(Conclusion.extract("short doc") == "short doc")
  }
}
