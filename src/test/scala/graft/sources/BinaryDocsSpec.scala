package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BinaryDocsSpec extends AnyFunSuite with SparkSpec {

  private def writeDir(): String = {
    val dir = Files.createTempDirectory("graft-pdf-src")
    Files.write(dir.resolve("a.pdf"), Array.fill[Byte](300)(7))
    Files.write(dir.resolve("b.pdf"), "short".getBytes("UTF-8"))
    Files.write(dir.resolve("c.txt"), "not a pdf".getBytes("UTF-8"))
    Files.write(dir.resolve("empty.pdf"), Array.emptyByteArray)
    dir.toString
  }

  test("binaryFile scan: glob prunes non-pdf, schema and sizes correct") {
    val docs = BinaryDocs.scanPdfDir(spark, writeDir()).collect()
      .sortBy(_.file_name)
    // zero-length files produce no scan row (binaryFile emits no split
    // for them) — same outcome as the reference failing to open an
    // empty PDF, so no special-casing needed downstream
    assert(docs.map(_.file_name).toSeq == Seq("a.pdf", "b.pdf"))
    assert(docs.map(_.n_bytes).toSeq == Seq(300L, 5L))
    // file_id is sha256(file_name) — the reference's F3 key
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("a.pdf".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(docs.head.file_id == expected)
  }

  test("extraction stub: page-per-256-bytes joined by newline, empty → empty") {
    val dir = writeDir()
    val byName = BinaryDocs.scanPdfDir(spark, dir).collect()
      .map(d => d.file_name -> d.text).toMap
    assert(byName("a.pdf").split("\n").length == 2)  // 300 bytes → 2 pages
    assert(byName("b.pdf").split("\n").length == 1)
    assert(BinaryDocs.extractStub(Array.emptyByteArray) == "")
    // deterministic across scans
    val again = BinaryDocs.scanPdfDir(spark, dir).collect()
      .map(d => d.file_name -> d.text).toMap
    assert(byName == again)
  }

  test("json response sink serializes all columns") {
    import spark.implicits._
    val res = Seq((1L, "appellant_won", 1.23)).toDF("file_id", "decision", "score")
    val out = BinaryDocs.jsonResponse(res).as[String].collect().head
    assert(out == """{"file_id":1,"decision":"appellant_won","score":1.23}""")
  }
}
