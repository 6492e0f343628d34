package graft.search

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** MaxSim late-interaction retrieval: brute-force ground truth on a
  * hand-poseable corpus, late-interaction-beats-pooling sanity, and
  * the plan gate (broadcast scoring join, no cartesian product).
  */
class MaxSimSpec extends AnyFunSuite with SparkSpec {

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    BigDecimal(dot / (na * nb))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("scores equal the brute-force Σ_q max_chunk cosine, ranked") {
    import spark.implicits._
    // 4 docs × 3 chunks, 2 queries × 2 vectors — deterministic floats
    val docs = for (d <- 0 until 4; c <- 0 until 3) yield
      (d.toLong, Seq.tabulate(8)(i => ((d * 31 + c * 7 + i * 3) % 13 - 6).toFloat))
    val qs = for (q <- 0 until 2; v <- 0 until 2) yield
      (q.toLong, (q * 10 + v).toLong,
        Seq.tabulate(8)(i => ((q * 17 + v * 5 + i) % 11 - 5).toFloat))
    val got = MaxSim.maxSimTopK(
        docs.toDF("doc_id", "emb"), col("doc_id"), col("emb"),
        qs.toDF("query_id", "qvec_id", "qvec"),
        col("query_id"), col("qvec_id"), col("qvec"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq.sortBy(t => (t._1, t._4))
    // brute force on the same 1e-4 grid
    val want = (for (q <- 0 until 2) yield {
      val qvecs = qs.filter(_._1 == q).map(_._3)
      val scored = (0 until 4).map { d =>
        val chunks = docs.filter(_._1 == d).map(_._2)
        val s = qvecs.map(qv => chunks.map(cv => cos(cv, qv)).max)
          .map(b => math.round(b * 10000d)).sum / 10000d
        (d.toLong, s)
      }.sortBy { case (d, s) => (-s, d) }.take(3)
      scored.zipWithIndex.map { case ((d, s), i) => (q.toLong, d, s, i + 1) }
    }).flatten
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("late interaction beats single-representative pooling on a posed corpus") {
    import spark.implicits._
    // doc 0's two chunks each match ONE query facet perfectly; doc 1's
    // single repeated chunk is a middling match for both facets. The
    // reference's chunk-0 representative (F5) would score doc 0 by its
    // first chunk only; MaxSim lets both facets find their chunk.
    val e1 = Seq(1f, 0f, 0f, 0f)
    val e2 = Seq(0f, 1f, 0f, 0f)
    val mid = Seq(1f, 1f, 0.5f, 0f)
    val docs = Seq((0L, e1), (0L, e2), (1L, mid), (1L, mid))
      .toDF("doc_id", "emb")
    val qs = Seq((0L, 0L, e1), (0L, 1L, e2)).toDF("q", "qv", "qvec")
    val top = MaxSim.maxSimTopK(docs, col("doc_id"), col("emb"),
        qs, col("q"), col("qv"), col("qvec"), k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(top.head._1 == 0L && top.head._2 == 2.0,
      s"both facets must match their own chunk exactly: ${top.toSeq}")
    assert(top(1)._1 == 1L && top(1)._2 < 2.0)
  }

  test("IVF route: exact at full probe; pruning keeps the top doc at modest nprobe") {
    import spark.implicits._
    // 20 docs × 4 chunks, clustered geometry so IVF routing is
    // meaningful; 2 queries × 2 vectors
    val docs = (for (d <- 0 until 20; c <- 0 until 4) yield
      (d.toLong, Seq.tabulate(8)(i =>
        ((d % 5) * 50 + c * 3 + ((d * 31 + c * 7 + i * 13) % 17)).toFloat)))
      .toDF("doc_id", "emb")
    val qs = (for (q <- 0 until 2; v <- 0 until 2) yield
      (q.toLong, (q * 10 + v).toLong, Seq.tabulate(8)(i =>
        ((q % 5) * 50 + v * 3 + ((q * 11 + v * 5 + i * 13) % 17)).toFloat)))
      .toDF("query_id", "qvec_id", "qvec")
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    val exact = run(MaxSim.maxSimTopK(docs, col("doc_id"), col("emb"),
      qs, col("query_id"), col("qvec_id"), col("qvec"), k = 5))
    // full probe == exact, bit for bit
    val full = run(MaxSim.maxSimTopKIvf(docs, col("doc_id"), col("emb"),
      qs, col("query_id"), col("qvec_id"), col("qvec"), k = 5,
      nlist = 5, nprobe = 5))
    assert(full == exact, s"\nfull-probe $full\nexact     $exact")
    // pruned probe: the exact top-1 doc per query must survive the
    // clustered geometry (its chunks live in the query's own cluster)
    val pruned = run(MaxSim.maxSimTopKIvf(docs, col("doc_id"), col("emb"),
      qs, col("query_id"), col("qvec_id"), col("qvec"), k = 5,
      nlist = 5, nprobe = 2))
    val exactTop = exact.filter(_._4 == 1).map(t => (t._1, t._2)).toSet
    val prunedTop = pruned.filter(_._4 == 1).map(t => (t._1, t._2)).toSet
    assert(exactTop == prunedTop,
      s"pruning lost a top doc: exact $exactTop pruned $prunedTop")
  }

  test("plan: broadcast scoring join, no cartesian product, no corpus window") {
    import spark.implicits._
    val docs = (0 until 40).map(i =>
      (i.toLong % 8, Seq.tabulate(8)(j => (i + j).toFloat))).toDF("d", "e")
    val qs = (0 until 4).map(i =>
      (i.toLong % 2, i.toLong, Seq.tabulate(8)(j => (i * j).toFloat)))
      .toDF("q", "qv", "e")
    val plan = MaxSim.maxSimTopK(docs, col("d"), col("e"),
        qs, col("q"), col("qv"), col("e"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast against the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian product allowed:\n$plan")
    assert(!plan.contains("Window"),
      s"ranking must run in the bounded aggregate, not a window:\n$plan")
  }
}
