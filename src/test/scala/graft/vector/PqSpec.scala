package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus
  private def corpus(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(7L)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat())))
  }

  private def df(rows: Seq[(Long, Seq[Float])], parts: Int = 3) =
    rows.toDF("vec_id", "embedding").repartition(parts)

  test("full codebook: encode then decode is the identity") {
    val rows = corpus(60, 16)
    // plant duplicates: rows 50-59 copy rows 0-9
    val planted = rows.take(50) ++ rows.take(10).zipWithIndex.map {
      case ((_, v), i) => ((50 + i).toLong, v)
    }
    val d = df(planted)
    val model = Quantize.trainPq(d, m = 4, ksub = 1 << 20)
    val bad = d.select(col("vec_id"),
        Quantize.pqDecode(model, Quantize.pqEncode(model, col("embedding"))).as("r"),
        col("embedding"))
      .where(col("r") =!= col("embedding"))
      .count()
    assert(bad === 0L)
  }

  test("codes are bounded, length m, and partition-invariant") {
    val rows = corpus(40, 8)
    val model = Quantize.trainPq(df(rows), m = 4, ksub = 8)
    def codesOf(parts: Int) =
      df(rows, parts).select(col("vec_id"),
          Quantize.pqEncode(model, col("embedding")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val c1 = codesOf(1)
    assert(c1.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    assert(c1 === codesOf(5))
  }

  test("reconstruction error shrinks as ksub grows") {
    val rows = corpus(80, 8)
    val d = df(rows)
    def maxErr(ksub: Int): Double = {
      val model = Quantize.trainPq(d, m = 4, ksub = ksub)
      d.select(aggregate(
          zip_with(col("embedding"),
            Quantize.pqDecode(model, Quantize.pqEncode(model, col("embedding"))),
            (a, b) => abs(a.cast("double") - b.cast("double"))),
          lit(0.0), (m, v) => greatest(m, v)).as("e"))
        .agg(max(col("e"))).head().getDouble(0)
    }
    val coarse = maxErr(2)
    val fine = maxErr(64)
    assert(fine < coarse)
    assert(maxErr(1 << 20) === 0.0)
  }

  test("ivfPqKnnJoin at full probe + full codebook equals the brute-force join") {
    val rows = corpus(50, 16)
    val d = df(rows)
    val idx = Ann.buildIvf(d, nlist = 4)
    val pq = Quantize.trainPq(d, m = 4, ksub = 1 << 20)
    val queries = d.select(col("vec_id").as("id"), col("embedding"))
      .where(col("id") < 5)
    val got = Ann.ivfPqKnnJoin(queries, idx, pq, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val want = Knn.similarityJoin(queries,
        d.select(col("vec_id").as("id"), col("embedding")), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.sorted.toSeq === want.sorted.toSeq)
  }

  test("ivfPqKnnJoin partial probe returns candidates only from probed clusters") {
    val rows = corpus(60, 8)
    val d = df(rows)
    val idx = Ann.buildIvf(d, nlist = 6)
    val pq = Quantize.trainPq(d, m = 4, ksub = 16)
    val queries = d.select(col("vec_id").as("id"), col("embedding"))
      .where(col("id") < 4)
    val out = Ann.ivfPqKnnJoin(queries, idx, pq, k = 5, nprobe = 2)
    // every returned right id must live in one of its query's 2 probed clusters
    val assignments = idx.assigned.select(col("vec_id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = queries.select(col("id"),
        VectorKernels.nearestCentroids(col("embedding"), idx.centroids, 2).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    out.collect().foreach { r =>
      assert(probed(r.getLong(0)).contains(assignments(r.getLong(1))))
    }
  }

  test("invalid geometry is rejected") {
    val d = df(corpus(10, 10))
    intercept[IllegalArgumentException] {
      Quantize.trainPq(d, m = 4, ksub = 4) // 10 % 4 != 0
    }
  }
}
