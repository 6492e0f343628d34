package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PSI drift monitor: identical distributions score ~0, a shifted
  * distribution scores high, smoothing keeps one-sided buckets finite,
  * and the closed-form arithmetic matches a hand computation.
  */
class DriftSpec extends AnyFunSuite with SparkSpec {

  private def obs(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  test("identical distributions give PSI 0") {
    val a = obs(("s", 1L), ("s", 1L), ("s", 2L), ("s", 3L))
    val out = Drift.psiByGroup(a, a, "g", col("v")).collect().head
    assert(out.getDouble(1) == 0.0 && out.getLong(2) == 4L && out.getLong(3) == 4L)
  }

  test("a hard shift scores far above the 0.25 alarm threshold") {
    val base = obs((1 to 50).map(i => ("s", (i % 3).toLong)): _*)
    val curr = obs((1 to 50).map(i => ("s", (i % 3 + 10).toLong)): _*)
    val psi = Drift.psiByGroup(base, curr, "g", col("v"))
      .collect().head.getDouble(1)
    assert(psi > 1.0, s"disjoint supports must alarm loudly: $psi")
  }

  test("hand-computed two-bucket PSI matches (smoothing included)") {
    // base: bucket0 ×3, bucket1 ×1; curr: bucket0 ×1, bucket1 ×3
    // B = 2, p = (c+1)/(4+2): p0 = 4/6, p1 = 2/6; q0 = 2/6, q1 = 4/6
    val base = obs(("s", 0L), ("s", 0L), ("s", 0L), ("s", 1L))
    val curr = obs(("s", 0L), ("s", 1L), ("s", 1L), ("s", 1L))
    val p0 = 4.0 / 6; val q0 = 2.0 / 6
    val term = (p0 - q0) * math.log(p0 / q0) // symmetric: ×2
    val want = math.round(
      (math.round(term * 1e6) * 2) / 1e6 * 1e4) / 1e4.toDouble
    val got = Drift.psiByGroup(base, curr, "g", col("v"))
      .collect().head.getDouble(1)
    assert(got == want, s"got $got want $want")
  }

  test("one-sided buckets stay finite and per-group results are independent") {
    val base = obs(("a", 0L), ("a", 1L), ("b", 5L))
    val curr = obs(("a", 9L), ("b", 5L))   // bucket 9 absent in base
    val rows = Drift.psiByGroup(base, curr, "g", col("v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(!rows("a").isNaN && !rows("a").isInfinite && rows("a") > 0)
    assert(rows("b") == 0.0, "identical single-bucket group stays 0")
  }

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("embedding drift composes with Ann.buildIvf centroids: same set 0, rotated set alarms") {
    // two well-separated blobs in 4-d; anchors trained by the real IVF
    // coarse quantizer (the production composition)
    val blobA = (0L until 20L).map(i =>
      (i, Seq(1f + (i % 3) * 0.01f, 0f, 0f, 0f)))
    val blobB = (20L until 40L).map(i =>
      (i, Seq(0f, 1f + (i % 3) * 0.01f, 0f, 0f)))
    val corpus = vecs((blobA ++ blobB): _*)
    val idx = graft.vector.Ann.buildIvf(corpus, emb = "embedding", nlist = 2)
    val anchors = idx.centroids.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat).toSeq) }.toSeq
    val same = Drift.psiEmbedding(corpus, corpus, col("embedding"), anchors)
      .collect().head
    assert(same.getDouble(1) == 0.0 && same.getLong(2) == 40L)
    // "re-trained embedder": every vector moves to the OTHER blob's
    // direction — cluster occupancy flips, PSI alarms
    val rotated = vecs((blobA.map { case (i, v) => (i, v.reverse) } ++
      blobB.map { case (i, v) => (i, v.reverse) }): _*)
    val psi = Drift.psiEmbedding(corpus, rotated, col("embedding"), anchors)
      .collect().head.getDouble(1)
    assert(psi > 0.25, s"occupancy flip must alarm: $psi")
  }

  test("embeddingBucket ties break on the smaller anchor id in both engines' order") {
    val anchors = Seq((0, Seq(0f, 0f)), (1, Seq(0f, 0f)), (2, Seq(9f, 9f)))
    val got = vecs((7L, Seq(0f, 0f)))
      .select(Drift.embeddingBucket(col("embedding"), anchors))
      .collect().head.getInt(0)
    assert(got == 0, s"equidistant anchors must pick the smaller id: $got")
  }
}
