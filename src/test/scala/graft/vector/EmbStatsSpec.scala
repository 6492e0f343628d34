package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EmbStatsSpec extends AnyFunSuite with SparkSpec {

  private val dim = 4

  /** Fixture with a planted dominant direction: most variance along
    * (1, 1, 0, 0)/√2, small noise elsewhere.
    */
  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 1.0f, 0.1f, 0.0f)),
      (2L, Array(-1.0f, -1.0f, 0.0f, 0.1f)),
      (3L, Array(2.0f, 2.0f, -0.1f, 0.0f)),
      (4L, Array(-2.0f, -1.9f, 0.0f, -0.1f)),
      (5L, Array(0.5f, 0.4f, 0.1f, 0.1f)),
      (6L, Array(-0.5f, -0.6f, -0.1f, 0.0f))
    ).toDF("id", "emb")
  }

  test("covariance matches a naive double computation within quantization error") {
    val rows = vecs.collect().map(_.getAs[Seq[Float]]("emb").toArray)
    val n = rows.length
    val mean = Array.tabulate(dim)(i => rows.map(_(i).toDouble).sum / n)
    val out = EmbStats.covariance(vecs, col("emb"), dim).collect()
    assert(out.length == dim * (dim + 1) / 2)
    out.foreach { r =>
      val (i, j, c) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      val naive = rows.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      // 4dp component quantization bounds the moment error well inside 1e-3
      assert(math.abs(c - naive) < 1e-3, s"cov($i,$j): $c vs $naive")
    }
  }

  test("covariance is bit-identical under repartitioning") {
    val a = EmbStats.covariance(vecs, col("emb"), dim).orderBy("i", "j").collect()
    val b = EmbStats.covariance(vecs.repartition(7), col("emb"), dim)
      .orderBy("i", "j").collect()
    assert(a.map(_.getDouble(2)).toSeq == b.map(_.getDouble(2)).toSeq)
  }

  test("null and wrong-length embeddings are dropped, not counted") {
    import spark.implicits._
    val dirty = vecs.union(Seq(
      (7L, null.asInstanceOf[Array[Float]]),
      (8L, Array(1.0f, 2.0f))).toDF("id", "emb"))
    val clean = EmbStats.covariance(vecs, col("emb"), dim).orderBy("i", "j").collect()
    val fromDirty = EmbStats.covariance(dirty, col("emb"), dim).orderBy("i", "j").collect()
    assert(clean.map(_.getDouble(2)).toSeq == fromDirty.map(_.getDouble(2)).toSeq)
  }

  test("dim-1536 covariance: primitive aggregate, no corpus-row explosion") {
    import spark.implicits._
    val d = 1536
    // deterministic small corpus at the reference's real ada-002 width
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(20) { k =>
      (k.toLong, Array.tabulate(d)(i => (rnd.nextDouble() * 2 - 1).toFloat))
    }
    val df = rows.toDF("id", "emb")
    val cov = EmbStats.covariance(df, col("emb"), d)
    // plan gate: moments come from the single primitive aggregate, not
    // a per-row Generate over the corpus (the only Generate allowed is
    // the corpus-independent dim²-bounded index frame over range())
    val plan = cov.queryExecution.executedPlan.toString
    assert(plan.contains("moment_sums"), plan.take(2000))
    val spotChecks = cov.where(col("i") === col("j") && col("i") <= 3)
      .orderBy("i").collect()
    val n = rows.length
    spotChecks.foreach { r =>
      val i = r.getInt(0) - 1
      val xs = rows.map(_._2(i).toDouble)
      val mean = xs.sum / n
      val naive = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(r.getDouble(2) - naive) < 1e-3,
        s"var($i): ${r.getDouble(2)} vs $naive")
    }
    assert(cov.count() == d.toLong * (d + 1) / 2)
  }

  test("pcaTop recovers the planted dominant direction, sign-fixed positive") {
    val out = EmbStats.pcaTop(vecs, col("emb"), dim).orderBy("i").collect()
    val v = out.map(_.getAs[Double]("v"))
    val lambda = out.head.getAs[Double]("eigenvalue")
    // dominant direction ≈ (1,1,0,0)/√2: the two heavy coords near .707,
    // the noise coords near zero, and the sign convention makes them positive
    assert(v(0) > 0.6 && v(1) > 0.6, v.toSeq.toString)
    assert(math.abs(v(2)) < 0.1 && math.abs(v(3)) < 0.1, v.toSeq.toString)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-3)
    assert(lambda > 1.0, s"eigenvalue $lambda should carry the planted variance")
  }

  test("pcaProject equals the manual quantized dot with the trained component") {
    val (vInt, _) = EmbStats.powerIterate(
      EmbStats.covMatrixForTest(vecs, col("emb"), dim), iters = 12)
    val scores = EmbStats.pcaProject(vecs, col("id"), col("emb"), dim)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.collect().foreach { r =>
      val id = r.getAs[Long]("id")
      val e = r.getSeq[Float](r.fieldIndex("emb"))
      val q = e.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
      val manual = q.zip(vInt).map { case (a, b) => a * b }.sum / (10000d * 1e6d)
      assert(scores(id) == manual, s"id $id")
    }
  }

  test("projection along the dominant direction separates the fixture by magnitude") {
    val s = EmbStats.pcaProject(vecs, col("id"), col("emb"), dim)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // ids 3/4 are the ±2-magnitude rows — largest |score|; 1/2 next; 5/6 smallest
    assert(math.abs(s(3L)) > math.abs(s(1L)) && math.abs(s(1L)) > math.abs(s(5L)))
    assert(s(3L) * s(4L) < 0, "opposite-side rows must project with opposite signs")
  }

  test("standardize matches a naive z-score and zeroes constant dimensions") {
    import spark.implicits._
    // dim 3 constant: σ = 0 must standardize to 0.0, not NaN
    val df = Seq(
      (1L, Array(1.0f, 10.0f, 7.0f)),
      (2L, Array(2.0f, 20.0f, 7.0f)),
      (3L, Array(3.0f, 30.0f, 7.0f))).toDF("id", "emb")
    val out = EmbStats.standardize(df, col("id"), col("emb"), dim = 3)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    // quantized components are exact here (1dp inputs at scale 1e4):
    // population σ of (1,2,3)·1e4 is √(2/3)·1e4
    val sd = math.sqrt(2.0 / 3.0)
    out.zip(Seq(-1.0, 0.0, 1.0)).foreach { case ((_, z), e) =>
      assert(math.abs(z(0) - e / sd) < 1e-12, s"z0 ${z(0)} vs ${e / sd}")
      assert(math.abs(z(1) - e / sd) < 1e-12, s"z1 ${z(1)}")
      assert(z(2) == 0.0, "constant dim must standardize to exactly 0.0")
    }
    // standardized column means are 0 and variances 1 (up to quantization)
    val zs = out.map(_._2)
    (0 to 1).foreach { d =>
      val m = zs.map(_(d)).sum / zs.length
      val v = zs.map(z => z(d) * z(d)).sum / zs.length
      assert(math.abs(m) < 1e-9 && math.abs(v - 1.0) < 1e-6)
    }
  }

  test("random projection is the exact sign-hash dot and preserves scaling") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 3.0f)),
      (2L, Array(2.0f, -4.0f, 1.0f, 6.0f))).toDF("id", "emb") // row2 = 2·row1
    val out = EmbStats.randomProjection(df, col("id"), col("emb"),
        dim = 4, k = 8)
      .orderBy("id").collect().map(r => r.getSeq[Double](1))
    assert(out.forall(_.length == 8))
    // linearity of the sign projection: y(2x) = 2·y(x) exactly (the
    // quantized components of 2·x are exactly 2·quantized(x) here)
    out(0).zip(out(1)).foreach { case (a, b) =>
      assert(b == 2.0 * a, s"$b != 2*$a")
    }
    // projection is not degenerate: some coordinate is non-zero
    assert(out(0).exists(_ != 0.0))
  }

  test("outlier scores: planted far row flags, typical rows do not") {
    import spark.implicits._
    val rows = (1L to 20L).map { i =>
      (i, Array(math.sin(i.toDouble).toFloat, math.cos(i.toDouble).toFloat))
    } :+ (99L, Array(40.0f, -40.0f)) // far outside the unit disc
    val df = rows.toDF("id", "emb")
    val out = EmbStats.outlierScores(df, col("id"), col("emb"), dim = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(99L)._2, s"planted outlier must flag: ${out(99L)}")
    assert(out.count(_._2._2) == 1, s"only the planted row flags: $out")
    // m2 is non-negative and the outlier's dominates
    assert(out(99L)._1 > out.filterKeys(_ != 99L).values.map(_._1).max * 5)
  }

  test("standardize and random projection plans stay narrow after training") {
    val plan = EmbStats.randomProjection(vecs, col("id"), col("emb"),
      dim = 4, k = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection apply must not shuffle:\n$plan")
  }
}
