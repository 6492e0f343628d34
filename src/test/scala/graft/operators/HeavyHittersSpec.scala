package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Misra-Gries summary: exactness at capacity ≥ distinct terms, the
  * error bound and guaranteed-presence property under a forced-small
  * capacity, and merge-order invariance of the exact configuration.
  */
class HeavyHittersSpec extends AnyFunSuite with SparkSpec {

  private def terms(reps: (String, Int)*) = {
    import spark.implicits._
    reps.flatMap { case (t, n) => Seq.fill(n)(t) }.toDS()
  }

  test("capacity beyond the vocabulary yields exact counts") {
    val ds = terms("a" -> 5, "b" -> 3, "c" -> 2)
    val out = HeavyHitters.summarize(ds, capacity = 10)
      .collect().map(h => (h.term, h.count)).toSeq
    assert(out == Seq(("a", 5L), ("b", 3L), ("c", 2L)))
  }

  test("exact configuration is invariant to partitioning (merge order)") {
    val ds = terms("x" -> 40, "y" -> 25, "z" -> 10, "w" -> 1)
    def run(parts: Int) = HeavyHitters.summarize(ds.repartition(parts), 100)
      .collect().map(h => (h.term, h.count)).toSeq
    assert(run(1) == run(7))
  }

  test("under capacity pressure: counts undercount within the bound, " +
    "heavy terms survive") {
    // n = 100, capacity 2 → bound n/(cap+1) = 33; "big" (60) must be
    // present with count ≥ 60 − 33
    val ds = terms("big" -> 60, "mid" -> 25, "s1" -> 5, "s2" -> 5, "s3" -> 5)
    val out = HeavyHitters.summarize(ds.coalesce(1), capacity = 2)
      .collect().map(h => (h.term, h.count, h.max_undercount)).toSeq
    assert(out.size <= 2)
    val big = out.find(_._1 == "big")
    assert(big.isDefined, s"heavy term evicted: $out")
    assert(big.get._2 >= 60L - big.get._3 && big.get._2 <= 60L)
    assert(out.forall(_._3 == 100L / 3))
  }

  test("state never exceeds capacity entries") {
    import spark.implicits._
    val ds = (1 to 5000).map(i => s"t$i").toDS()
    val out = HeavyHitters.summarize(ds, capacity = 16).collect()
    assert(out.length <= 16)
  }

  test("grouped summaries run independently per key with per-group bounds") {
    import spark.implicits._
    // group A: heavy term among noise; group B: disjoint vocabulary —
    // results must never leak across groups and A's bound must use A's
    // processed count, not the corpus's
    val rows = Seq.fill(200)(("A", "heavy")) ++
      (1 to 300).map(i => ("A", s"a$i")) ++
      (1 to 50).map(i => ("B", s"b${i % 10}"))
    val out = HeavyHitters.summarizeBy(rows.toDS(), capacity = 16)
      .collect()
    val byGroup = out.groupBy(_.group)
    assert(byGroup.keySet == Set("A", "B"))
    assert(byGroup("A").forall(_.term.startsWith("heavy") ||
      byGroup("A").forall(h => !h.term.startsWith("b"))), "no cross-group leak")
    assert(byGroup.values.forall(_.length <= 16), "per-group state bounded")
    // A: n=500, cap=16 → bound 29; the 200-count heavy term must
    // survive with count within [true - bound, true]
    val heavy = byGroup("A").find(_.term == "heavy").get
    assert(heavy.max_undercount == 500L / 17)
    assert(heavy.count <= 200 && heavy.count >= 200 - heavy.max_undercount)
    // B is under capacity (10 distinct) → exact, zero-looking bound data
    val b = byGroup("B").map(h => h.term -> h.count).toMap
    assert((0 until 10).forall(i => b(s"b$i") == 5L))
  }
}
