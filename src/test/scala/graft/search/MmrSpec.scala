package graft.search

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** MMR greedy re-rank: relevance limit (λ=1), the diversity trade
  * (a duplicate of the best hit is deferred behind a less-relevant but
  * novel one), tie-breaks, short pools, multi-query grouping, and
  * partitioning invariance.
  */
class MmrSpec extends AnyFunSuite with SparkSpec {

  import Mmr.Cand

  private def df(rows: Seq[Cand]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  private def order(out: DataFrame): Seq[Long] =
    out.collect().map(r => (r.getAs[Int]("mmr_rank"), r.getAs[Long]("doc_id")))
      .sortBy(_._1).map(_._2).toSeq

  // query = (1,0); d1 relevant, d2 an exact duplicate of d1, d3
  // orthogonal to d1 with moderate relevance
  private val pool = Seq(
    Cand(0L, 1L, Array(0.9f, 0.436f), 0.9),
    Cand(0L, 2L, Array(0.9f, 0.436f), 0.9),
    Cand(0L, 3L, Array(0.436f, -0.9f), 0.436))

  test("lambda=1 reduces to pure relevance order with id tie-breaks") {
    assert(order(Mmr.rerank(df(pool), k = 3, lambda = 1.0)) == Seq(1L, 2L, 3L))
  }

  test("the duplicate of the best hit is deferred behind a novel result") {
    // step 2 at lambda=0.5: dup d2 scores 0.45 - 0.5 = -0.05, novel d3
    // scores 0.218 - 0 = 0.218 — diversity outranks raw relevance
    assert(order(Mmr.rerank(df(pool), k = 3, lambda = 0.5)) == Seq(1L, 3L, 2L))
  }

  test("k beyond the pool emits the whole pool; scores round to 4dp") {
    val out = Mmr.rerank(df(pool), k = 10, lambda = 0.5)
    assert(out.count() == 3)
    val first = out.where(org.apache.spark.sql.functions.col("mmr_rank") === 1)
      .collect().head
    assert(first.getAs[Long]("doc_id") == 1L)
    assert(first.getAs[Double]("mmr_score") == 0.45)
  }

  test("queries re-rank independently within one call") {
    val two = pool ++ Seq(
      Cand(9L, 21L, Array(0.0f, 1.0f), 1.0),
      Cand(9L, 22L, Array(1.0f, 0.0f), 0.0))
    val out = Mmr.rerank(df(two), k = 2, lambda = 0.5)
    val byQ = out.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("mmr_rank")).map(_.getAs[Long]("doc_id")).toSeq)
      .toMap
    assert(byQ(0L) == Seq(1L, 3L))
    assert(byQ(9L) == Seq(21L, 22L))
  }

  test("selection is invariant to input partitioning") {
    val base = df(pool)
    assert(order(Mmr.rerank(base.repartition(5), k = 3, lambda = 0.5)) ==
      order(Mmr.rerank(base.coalesce(1), k = 3, lambda = 0.5)))
  }

  test("an oversized pool fails loudly instead of buffering unbounded state") {
    val big = (1 to 50).map(i => Cand(0L, i.toLong, Array(1.0f, 0.0f), 1.0))
    val ex = intercept[org.apache.spark.SparkException] {
      Mmr.rerank(df(big), k = 2, lambda = 0.5, maxPool = 10).collect()
    }
    assert(ex.getMessage.contains("MMR pool") || ex.getCause != null)
  }
}
