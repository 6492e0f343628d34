package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SplitsSpec extends AnyFunSuite with SparkSpec {

  test("assignByHash is a pure function of the id: stable across repartitioning") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("id")
    val once = Splits.assignByHash(ids, col("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = Splits.assignByHash(ids.repartition(13), col("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once == again)
    // roughly 80/10/10 (hash route is approximate)
    val counts = once.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 800) < 80, counts.toString)
    assert(counts.keySet == Set("train", "val", "test"))
  }

  test("stratifiedExact hits floor(n*pct/100) exactly in every stratum") {
    import spark.implicits._
    // deliberately unbalanced strata, including one too small for a val slice
    val rows = (0L until 200L).map(i => (i, "en")) ++
      (200L until 250L).map(i => (i, "de")) ++
      (250L until 253L).map(i => (i, "fr"))
    val out = Splits.stratifiedExact(rows.toDF("id", "lang"),
        col("id"), col("lang"))
      .groupBy("lang", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("en", "train")) == 160 && out(("en", "val")) == 20 &&
      out(("en", "test")) == 20, out.toString)
    assert(out(("de", "train")) == 40 && out(("de", "val")) == 5 &&
      out(("de", "test")) == 5, out.toString)
    // n=3: floor(2.4)=2 train, floor(2.7)=2 → no val, 1 test
    assert(out(("fr", "train")) == 2 && out(("fr", "test")) == 1 &&
      !out.contains(("fr", "val")), out.toString)
  }

  test("stratifiedScalable is bit-identical to stratifiedExact, collisions included") {
    import spark.implicits._
    val m = 1000003L
    // unbalanced strata; the +m ids collide with their base id's hash
    // bucket, forcing multi-row boundary buckets
    val rows = (0L until 300L).map(i => (i, "en")) ++
      (0L until 40L).map(i => (i + m, "en")) ++
      (300L until 347L).map(i => (i, "de")) ++
      Seq((400L, "fr"), (400L + m, "fr"), (400L + 2 * m, "fr")) ++
      (500L until 530L).map(i => (i, null.asInstanceOf[String]))  // null stratum
    val df = rows.toDF("id", "lang")
    for ((tp, vp) <- Seq((80, 10), (50, 25), (99, 1), (34, 0))) {
      val exact = Splits.stratifiedExact(df, col("id"), col("lang"), tp, vp)
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      val scalable = Splits.stratifiedScalable(df, col("id"), col("lang"), tp, vp)
        .collect().map(r => (r.getLong(0), r.getString(2))).toMap
      assert(scalable == exact,
        s"($tp,$vp): diff = ${(scalable.toSet diff exact.toSet).take(5)}")
    }
  }

  test("assignByClusterHash keeps every cluster in one split, singletons match assignByHash") {
    import spark.implicits._
    val ids = (0L until 300L).toDF("id")
    // clusters: {0..9} -> rep 0, {100..104} -> rep 100; rest singleton
    val labels = ((0L until 10L).map(i => (i, 0L)) ++
      (100L until 105L).map(i => (i, 100L))).toDF("id", "cluster_id")
    val out = Splits.assignByClusterHash(ids, col("id"), labels)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // each cluster entirely in one split (the representative's)
    assert((0L until 10L).map(out).toSet.size == 1)
    assert((100L until 105L).map(out).toSet.size == 1)
    // non-clustered rows agree with the plain hash route
    val plain = Splits.assignByHash(ids, col("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ((10L until 100L) ++ (105L until 300L)).foreach { i =>
      assert(out(i) == plain(i), s"singleton $i diverged")
    }
    // and clustered rows got their representative's plain label
    assert((0L until 10L).forall(i => out(i) == plain(0L)))
    assert((100L until 105L).forall(i => out(i) == plain(100L)))
  }

  test("assignByClusterHash rejects reserved column names") {
    import spark.implicits._
    val ids = Seq(1L).toDF("id").withColumn("__ls_rep", lit(1L))
    intercept[IllegalArgumentException] {
      Splits.assignByClusterHash(ids, col("id"),
        Seq((1L, 1L)).toDF("id", "cluster_id"))
    }
  }

  test("large ids do not overflow under ANSI mode") {
    import spark.implicits._
    val ids = Seq(Long.MaxValue - 1, 9999999999999L, 0L).toDF("id")
    val out = Splits.assignByHash(ids, col("id")).collect()
    assert(out.length == 3)
  }

  test("shardOrder is a permutation: every row exactly once, positions dense") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"d$i")).toDF("id", "payload")
    val out = Splits.shardOrder(df, col("id"), nShards = 8)
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(out.length == 500)
    assert(out.map(_._1).toSet == (1L to 500L).toSet)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
    }
    // decoupled from id order: the permutation must not be identity-ish
    val firstShard = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(!firstShard.sameElements(firstShard.sorted))
  }

  test("shardOrder is partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, i.toString)).toDF("id", "payload")
    val a = Splits.shardOrder(df, col("id"), 4).select("id", "shard", "pos")
      .collect().map(_.toString).sorted
    val b = Splits.shardOrder(df.repartition(9), col("id"), 4)
      .select("id", "shard", "pos").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
