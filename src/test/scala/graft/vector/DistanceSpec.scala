package graft.vector

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DistanceSpec extends AnyFunSuite with SparkSpec {

  private def eval(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                   a: Seq[Float], b: Seq[Float]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).cast("double"))
      .as[Double].head()
  }

  test("l2 distance: hand-computed 3-4-5 triangle") {
    assert(math.abs(eval(Distance.l2, Seq(0f, 0f), Seq(3f, 4f)) - 5.0) < 1e-12)
  }

  test("l2 axioms: identity and symmetry") {
    val x = Seq(1.5f, -2f, 3f)
    val y = Seq(0.5f, 4f, -1f)
    assert(eval(Distance.l2, x, x) == 0.0)
    assert(eval(Distance.l2, x, y) == eval(Distance.l2, y, x))
    assert(eval(Distance.l2, x, y) > 0.0)
  }

  test("cosine similarity: parallel=1, orthogonal=0, antiparallel=-1") {
    assert(math.abs(eval(Distance.cosine, Seq(2f, 0f), Seq(5f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(eval(Distance.cosine, Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
    assert(math.abs(eval(Distance.cosine, Seq(1f, 1f), Seq(-1f, -1f)) + 1.0) < 1e-12)
  }

  test("dot product matches hand computation") {
    assert(eval(Distance.dot, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)) == 32.0)
  }

  test("fused codegen kernels are bit-identical to the built-in forms") {
    import spark.implicits._
    // fixture vectors with awkward floats to exercise accumulation order
    val rows = Seq(
      (Seq(0.1f, -2.7f, 3.333f, 9.81f), Seq(1.0f, 0.003f, -8.25f, 0.5f)),
      (Seq(1e-8f, 1e8f, -1e-8f, -1e8f), Seq(5f, -5f, 5f, -5f)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      (Distance.l2($"a", $"b") === Distance.l2Builtin($"a", $"b")).as("l2eq"),
      (Distance.dot($"a", $"b") === Distance.dotBuiltin($"a", $"b")).as("doteq"),
      (Distance.cosine($"a", $"b") === Distance.cosineBuiltin($"a", $"b")).as("coseq"))
      .collect()
    out.foreach { r =>
      assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
    }
  }
}
