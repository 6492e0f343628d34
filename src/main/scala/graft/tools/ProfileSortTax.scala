package graft.tools

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Sort

/** r17 triage: the range-partitioning SAMPLING pass of a trailing
  * global orderBy re-executes the query subtree down to the nearest
  * shuffle. Quantify that tax per query: time (a) the declared query,
  * (b) the query with a trailing logical Sort stripped, (c) the
  * localCheckpoint-then-sort variant. args: sfDir q1,q2,...
  */
object ProfileSortTax {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    spark.range(100).count()
    graft.sources.Tables.documents(spark, dir).count()
    def t(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // run order full,full,nosort,nosort,ckpt,ckpt — second run of each
    // variant is steady-state (codegen cache warm); compare THOSE.
    println(f"${"query"}%-34s ${"full1"}%7s ${"full2"}%7s ${"nosrt1"}%7s ${"nosrt2"}%7s ${"ckpt1"}%7s ${"ckpt2"}%7s")
    for (n <- names) {
      try {
        val fn = graft.SparkEntry.queries(n)
        def clean(): Unit = {
          spark.sharedState.cacheManager.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
        val full1 = t(fn(spark, dir)); clean()
        val full2 = t(fn(spark, dir)); clean()
        def strippedDf(): Option[DataFrame] =
          fn(spark, dir).queryExecution.logical match {
            case Sort(_, true, child, _) =>
              Some(GraftColumnBridge.ofRows(spark, child))
            case _ => None
          }
        // construction stays INSIDE the by-name t() so eager work
        // (localCheckpoints in iterative operators) is timed, exactly
        // as the bench times it
        def nsOnce(): Double =
          try t(strippedDf().get) catch { case _: NoSuchElementException => Double.NaN }
        val ns1 = nsOnce(); clean()
        val ns2 = nsOnce(); clean()
        def ckptDf(): Option[DataFrame] =
          fn(spark, dir).queryExecution.logical match {
            case Sort(order, true, child, _) =>
              Some(GraftColumnBridge.ofRows(spark, child).localCheckpoint()
                .sort(order.map(GraftColumnBridge.column): _*))
            case _ => None
          }
        def ckOnce(): Double =
          try t(ckptDf().get) catch { case _: NoSuchElementException => Double.NaN }
        val ck1 = ckOnce(); clean()
        val ck2 = ckOnce(); clean()
        println(f"$n%-34s $full1%7.2f $full2%7.2f $ns1%7.2f $ns2%7.2f $ck1%7.2f $ck2%7.2f")
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage.take(120)}") }
    }
    spark.stop()
  }
}
