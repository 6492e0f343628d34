package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Sort}

/** r17: find declared queries with a global Sort that is NOT the root
  * (so checkpointTrailingSort missed it) and not under a Limit
  * (TakeOrdered — fine). Those still pay the sampling double-execution.
  */
object ListSorts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val slow = Set("streaming", "serving") // skip gate-running entries
    for ((n, fn) <- graft.SparkEntry.rawQueries.toSeq.sortBy(_._1)
         if !slow.exists(n.startsWith)) {
      try {
        val plan = fn(spark, dir).queryExecution.logical
        def scan(p: LogicalPlan, underLimit: Boolean, isRoot: Boolean): Seq[String] =
          p match {
            case s @ Sort(_, true, child, _) =>
              val here = if (!isRoot && !underLimit) Seq(s"inner-global-sort") else Nil
              here ++ scan(child, underLimit, isRoot = false)
            case l: GlobalLimit => l.children.flatMap(scan(_, underLimit = true, isRoot = false))
            case l: LocalLimit => l.children.flatMap(scan(_, underLimit = true, isRoot = false))
            case other => other.children.flatMap(scan(_, underLimit = false, isRoot = false))
          }
        val hits = scan(plan, underLimit = false, isRoot = true)
        if (hits.nonEmpty) println(s"$n: ${hits.size} non-root global sort(s)")
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
