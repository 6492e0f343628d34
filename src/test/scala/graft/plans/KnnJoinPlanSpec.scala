package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables
import graft.vector.Knn

/** The custom broadcast-KNN physical operator vs the compositional
  * similarity join: identical output contract, no exchange in the plan,
  * null tolerance, and the driver-collect size guard.
  */
class KnnJoinPlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, dir)
    .select(col("vec_id").as("id"), col("embedding"))

  test("matches the compositional similarityJoin row for row") {
    val left = emb.where(col("id") < 20)
    val expected = Knn.similarityJoin(left, emb, k = 3)
      .orderBy("left_id", "rank").collect().toSeq
    val actual = BroadcastKnn.similarityJoin(left, emb, k = 3)
      .orderBy("left_id", "rank").collect().toSeq
    assert(actual == expected)
  }

  test("plan contains the custom exec and no shuffle exchange") {
    val df = BroadcastKnn.similarityJoin(emb.where(col("id") < 5), emb, k = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastKnn"), s"custom exec missing:\n$plan")
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"unexpected exchange:\n$plan")
  }

  test("left_id filter pushes through the join into the left child") {
    val df = BroadcastKnn.similarityJoin(emb, emb, k = 3)
      .where(col("left_id") < 5 && col("rank") === 1)
    val opt = df.queryExecution.optimizedPlan
    // the KnnJoin node must sit ABOVE the left_id filter after the
    // rewrite; only the rank conjunct may remain on top
    val top = opt.collectFirst { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }.get
    assert(!top.condition.toString.contains("left_id <"),
      s"left_id filter not pushed:\n$opt")
    assert(opt.toString.contains("KnnJoin"), s"KnnJoin missing:\n$opt")
    // semantics: identical to pre-filtering the left input
    val expected = BroadcastKnn.similarityJoin(emb.where(col("id") < 5), emb, k = 3)
      .where(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == expected && got.size == 5)
  }

  test("count-only consumption keeps child columns alive (pruning regression)") {
    // nothing downstream references the node's output, and the node's
    // expressions reference no child column — without the `references`
    // override ColumnPruning emptied both children and the exec read
    // zero-field rows (intermittent SIGSEGV)
    val left = emb.where(col("id") < 20)
    val counted = BroadcastKnn.similarityJoin(left, emb, k = 3).groupBy().count()
    val opt = counted.queryExecution.optimizedPlan.toString
    assert(!opt.matches("(?s).*Project\\s*\\n\\s*:?\\+?- Filter.*") ||
      opt.contains("AS id"), s"children were pruned empty:\n$opt")
    assert(counted.collect().head.getLong(0) == left.count() * 3)
  }

  test("null ids / null embeddings are dropped, not NPE'd") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), Some(Seq(1.0f, 0.0f))),
      (None: Option[Long], Some(Seq(0.5f, 0.5f))),
      (Some(2L), None: Option[Seq[Float]]))
      .toDF("id", "embedding")
    val right = Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.0f, 1.0f)))
      .toDF("id", "embedding")
    val out = BroadcastKnn.similarityJoin(left, right, k = 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.length == 2)
  }

  test("oversized right side fails fast with a clear error") {
    spark.conf.set("graft.knn.maxBroadcastRows", "10")
    try {
      val e = intercept[Exception] {
        BroadcastKnn.similarityJoin(emb.where(col("id") < 2), emb, k = 1).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("maxBroadcastRows")), e.toString)
    } finally spark.conf.unset("graft.knn.maxBroadcastRows")
  }

  test("k larger than the right side emits all right rows per left row") {
    import spark.implicits._
    val left = Seq((1L, Seq(0.0f, 0.0f))).toDF("id", "embedding")
    val right = Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.0f, 2.0f))).toDF("id", "embedding")
    val out = BroadcastKnn.similarityJoin(left, right, k = 5)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq ==
      Seq((10L, 1.0, 1), (11L, 2.0, 2)))
  }
}
