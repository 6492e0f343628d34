package graft.sources

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** JSONL / ORC round trips must be lossless for the scalar corpus
  * payload — including the characters JSON must escape.
  */
class FormatsSpec extends AnyFunSuite with SparkSpec {

  private def fixture: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "plain ascii text", Some("en")),
      (2L, "embedded\nnewline and \"quotes\" and \\backslash", Some("en")),
      (3L, "unicode: 日本語 café ©", Some("ja")),
      (4L, "", None: Option[String])
    ).toDF("doc_id", "text", "lang")
  }

  private def rows(df: DataFrame): Seq[(Long, String, Option[String])] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)))).sortBy(_._1).toSeq

  test("jsonl round trip is lossless, including escaped characters") {
    assert(rows(Formats.jsonlRoundTrip(fixture)) == rows(fixture))
  }

  test("orc round trip is lossless") {
    assert(rows(Formats.orcRoundTrip(fixture)) == rows(fixture))
  }

  test("jsonl read uses the explicit schema, not inference") {
    // names and types pinned; nullability is not — a JSON source is
    // always nullable (any line may omit any field)
    val back = Formats.jsonlRoundTrip(fixture)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      fixture.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
