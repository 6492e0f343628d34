package graft.vector

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GroupedTopKSpec extends AnyFunSuite with SparkSpec {

  test("bounded-state aggregate matches a window row_number top-k") {
    import spark.implicits._
    // 3 groups × 40 rows with deterministic pseudo-random scores
    val rows = for (g <- 1 to 3; i <- 1 to 40)
      yield (g, i.toLong, ((i * 37 + g * 11) % 100).toDouble)
    val df = rows.toDF("grp", "id", "score")

    val agg = GroupedTopK.topKPerGroup(df, col("grp"), k = 5)
      .select("grp", "id", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"score".asc, $"id".asc)
    val win = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= 5)
      .select("grp", "id", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet

    assert(agg == win)
  }

  test("ties break by id deterministically") {
    import spark.implicits._
    val df = Seq((1, 10L, 5.0), (1, 2L, 5.0), (1, 7L, 5.0)).toDF("grp", "id", "score")
    val out = GroupedTopK.topKPerGroup(df, col("grp"), k = 2)
      .orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 7L))
  }
}
