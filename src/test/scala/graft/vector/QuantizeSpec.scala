package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QuantizeSpec extends AnyFunSuite with SparkSpec {

  private def quant(vecs: Seq[Seq[Float]]) = {
    import spark.implicits._
    vecs.toDF("e")
      .select(Quantize.int8(col("e").cast("array<float>")).as("q"))
      .select("q.scale", "q.codes", "q.recon_err")
      .collect()
  }

  test("extremes hit ±127, zero vector quantizes to zeros with scale 0") {
    val rows = quant(Seq(
      Seq(1.0f, -1.0f, 0.5f, 0.0f),
      Seq(0.0f, 0.0f, 0.0f, 0.0f)))
    val r0 = rows(0)
    assert(r0.getSeq[Int](1) == Seq(127, -127, 64, 0))
    // stored scale is rounded to 8dp → up to 5e-9 off the exact value
    assert(math.abs(r0.getDouble(0) - 1.0 / 127.0) < 5e-9)
    val r1 = rows(1)
    assert(r1.getDouble(0) == 0.0)
    assert(r1.getSeq[Int](1) == Seq(0, 0, 0, 0))
    assert(r1.getDouble(2) == 0.0)
  }

  test("reconstruction error bounded by scale/2 on random vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    quant(vecs).foreach { r =>
      val scale = r.getDouble(0)
      // 6dp rounding of the stored err adds ≤5e-7 slack
      assert(r.getDouble(2) <= scale / 2 + 5e-7,
        s"err ${r.getDouble(2)} vs scale $scale")
      assert(r.getSeq[Int](1).forall(c => c >= -127 && c <= 127))
    }
  }

  test("dequantized cosine stays close to the float cosine") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(30)((Seq.fill(32)(rnd.nextFloat() * 2 - 1),
      Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
      .select(
        Distance.cosine(col("a"), col("b")).as("exact"),
        Quantize.int8(col("a")).as("qa"), Quantize.int8(col("b")).as("qb"))
      .select(col("exact"),
        Distance.cosineBuiltin(
          transform(col("qa.codes"), c => (c * col("qa.scale")).cast("float")),
          transform(col("qb.codes"), c => (c * col("qb.scale")).cast("float")))
          .as("approx"))
      .collect()
    df.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"cosine drift ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }
}
