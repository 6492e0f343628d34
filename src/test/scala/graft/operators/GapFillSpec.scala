package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GapFillSpec extends AnyFunSuite with SparkSpec {

  test("dense fills each key's full span: zeros for counts, carry-forward for measures") {
    import spark.implicits._
    val obs = Seq(
      ("a", 10L, 2L, 1.5),
      ("a", 13L, 1L, 9.0),   // gap at 11, 12
      ("b", 5L, 4L, 2.0)     // single-bucket span
    ).toDF("k", "bucket", "n", "mx")
    val out = GapFill.dense(obs, "k", "bucket",
        zeroFill = Seq("n"), carryForward = Seq("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set(
      ("a", 10L, 2L, 1.5),
      ("a", 11L, 0L, 1.5),   // generated: zero count, carried max
      ("a", 12L, 0L, 1.5),
      ("a", 13L, 1L, 9.0),
      ("b", 5L, 4L, 2.0)))
  }

  test("a null key keeps its own observations (null-safe grid join)") {
    import spark.implicits._
    val obs = Seq((null.asInstanceOf[String], 1L, 5L, 2.0),
      (null.asInstanceOf[String], 3L, 1L, 7.0)).toDF("k", "bucket", "n", "mx")
    val out = GapFill.dense(obs, "k", "bucket", Seq("n"), Seq("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set((1L, 5L, 2.0), (2L, 0L, 2.0), (3L, 1L, 7.0)))
  }

  test("a span beyond maxSpan raises a clear error instead of allocating it") {
    import spark.implicits._
    val obs = Seq(("a", 0L, 1L, 1.0), ("a", 50L, 1L, 2.0)).toDF("k", "bucket", "n", "mx")
    val e = intercept[Exception] {
      GapFill.dense(obs, "k", "bucket", Seq("n"), Seq("mx"), maxSpan = 10L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("spans more than")), e.getMessage)
  }

  test("no gaps means identity") {
    import spark.implicits._
    val obs = Seq(("a", 1L, 1L, 0.5), ("a", 2L, 2L, 0.7)).toDF("k", "bucket", "n", "mx")
    val out = GapFill.dense(obs, "k", "bucket", Seq("n"), Seq("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set(("a", 1L, 1L, 0.5), ("a", 2L, 2L, 0.7)))
  }
}
