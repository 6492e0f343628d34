package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LinearClassifierSpec extends AnyFunSuite with SparkSpec {

  /** Separable fixture: long docs (many chars) labeled 1, short ones 0 —
    * the chars feature alone separates it.
    */
  private def fixture = {
    import spark.implicits._
    val long = (1 to 20).map(i => (i.toLong, ("verylongword " * 40).trim, 1))
    val short = (21 to 40).map(i => (i.toLong, "tiny doc", 0))
    (long ++ short).map { case (id, t, y) => (id, t, t.length.toLong, y) }
      .toDF("id", "text", "n_chars", "y")
  }

  test("learns a separable statistic to perfect training accuracy") {
    val out = LinearClassifier.scoreDocs(fixture, col("id"), col("text"),
      col("n_chars"), col("y") === 1, iters = 30, lr = 2.0).collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(r.getAs[Boolean]("pred") == (r.getAs[Long]("y") == 1L),
        s"misclassified id ${r.getAs[Long]("id")}")
    }
  }

  test("training is bit-identical under repartitioning") {
    val a = LinearClassifier.trainWeights(fixture, col("id"), col("text"),
      col("n_chars"), col("y") === 1, iters = 10).orderBy("k").collect()
    val b = LinearClassifier.trainWeights(fixture.repartition(7), col("id"),
      col("text"), col("n_chars"), col("y") === 1, iters = 10)
      .orderBy("k").collect()
    assert(a.map(_.getDouble(1)).toSeq == b.map(_.getDouble(1)).toSeq)
  }

  test("the separating feature carries the dominant positive weight") {
    val w = LinearClassifier.trainWeights(fixture, col("id"), col("text"),
      col("n_chars"), col("y") === 1, iters = 30, lr = 2.0)
      .orderBy("k").collect().map(_.getDouble(1))
    // k=2 is the chars feature: positive, and the largest non-bias weight
    assert(w(1) > 0, w.toSeq.toString)
    assert(w(1) >= w.toSeq.drop(1).max, w.toSeq.toString)
  }

  test("scores are clamped to [0, 1] and predictions follow the dot sign") {
    val out = LinearClassifier.scoreDocs(fixture, col("id"), col("text"),
      col("n_chars"), col("y") === 1, iters = 30, lr = 2.0).collect()
    out.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 1.0)
      if (s > 0.5) assert(r.getAs[Boolean]("pred"))
      if (s < 0.5) assert(!r.getAs[Boolean]("pred"))
    }
  }

  test("refuses to train on an empty dataset") {
    intercept[IllegalArgumentException] {
      LinearClassifier.trainWeights(fixture.where(col("id") < 0), col("id"),
        col("text"), col("n_chars"), col("y") === 1, iters = 1).collect()
    }
  }
}
