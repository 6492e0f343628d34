package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Prefix: the two-phase global cumulative aggregates must equal the
  * serial single-partition-window form at any partitioning.
  */
class PrefixSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // pseudo-random but fixed: values vary, keys unique
  private def fixture(n: Int) =
    (0 until n).map(i => ((i * 137 + 41) % n, (i % 23).toLong + 1L))
      .toDF("k", "v") // k is a permutation of 0..n-1 → unique

  test("withCumSum equals the serial window form") {
    val df = fixture(500).repartition(7)
    val got = Prefix.withCumSum(df, col("v"), "cum", col("k"))
      .select("k", "v", "cum")
    val want = df.withColumn("cum",
      sum("v").over(Window.orderBy("k")))
    assert(got.orderBy("k").collect().toSeq ===
      want.select("k", "v", "cum").orderBy("k").collect().toSeq)
  }

  test("withRowNumber equals the serial row_number") {
    val df = fixture(300).repartition(5)
    val got = Prefix.withRowNumber(df, "rn", col("k"))
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy("k")).cast("long"))
    assert(got.select("k", "rn").orderBy("k").collect().toSeq ===
      want.select("k", "rn").orderBy("k").collect().toSeq)
  }

  test("result is invariant to input partitioning") {
    val a = Prefix.withCumSum(fixture(400).repartition(2), col("v"), "cum", col("k"))
    val b = Prefix.withCumSum(fixture(400).repartition(13), col("v"), "cum", col("k"))
    assert(a.orderBy("k").collect().toSeq === b.orderBy("k").collect().toSeq)
  }

  test("reserved / duplicate output columns are rejected") {
    val df = fixture(10)
    intercept[IllegalArgumentException] {
      Prefix.withCumSum(df, col("v"), "v", col("k"))
    }
    intercept[IllegalArgumentException] {
      Prefix.withCumSum(df.withColumn("__prefix_val", lit(1L)),
        col("v"), "cum", col("k"))
    }
  }

  test("chained calls stay correct and deterministic across executions") {
    // regression: the original one-plan implementation tagged rows
    // with spark_partition_id() and joined offsets back; AQE could
    // coalesce the offsets branch and the data branch differently,
    // giving nondeterministic row numbers when calls were chained
    val df = fixture(600).repartition(9)
    val chained = Prefix.withRowNumber(
      Prefix.withCumSum(df, col("v"), "cum", col("k")), "rn", col("k"))
    val first = chained.orderBy("k").collect().toSeq
    val second = chained.orderBy("k").collect().toSeq
    assert(first === second)
    first.foreach { r =>
      assert(r.getAs[Long]("rn") === r.getAs[Int]("k").toLong + 1L)
    }
  }

  test("null values count as zero") {
    val df = Seq((1, Some(3L)), (2, None), (3, Some(4L)))
      .toDF("k", "v")
    val got = Prefix.withCumSum(df, col("v"), "cum", col("k"))
      .orderBy("k").select("cum").as[Long].collect().toSeq
    assert(got === Seq(3L, 3L, 7L))
  }

  test("packSequences: start offsets are consecutive and land in their sequence's budget window") {
    val docs = (0 until 200)
      .map(i => (i.toLong, (i % 37).toLong + 1L)).toDF("id", "ntok")
      .repartition(6)
    val packed = Prefix.packSequences(docs, col("ntok"), budget = 64L, col("id"))
      .collect().sortBy(_.getAs[Long]("start_off"))
    // consecutive layout: each start = previous start + previous ntok
    packed.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("start_off") ===
          a.getAs[Long]("start_off") + a.getAs[Long]("ntok"))
      case _ =>
    }
    // membership by start offset
    packed.foreach { r =>
      val (off, seq) = (r.getAs[Long]("start_off"), r.getAs[Long]("seq_id"))
      assert(seq === off / 64L)
    }
    assert(packed.head.getAs[Long]("start_off") === 0L)
  }

  test("packSequences rejects a non-positive budget") {
    val docs = Seq((1L, 2L)).toDF("id", "ntok")
    intercept[IllegalArgumentException] {
      Prefix.packSequences(docs, col("ntok"), budget = 0L, col("id"))
    }
  }
}
