package graft.tools

import org.apache.spark.sql.SparkSession

/** r17: is scan parallelism 1 for the small harness files (openCost
  * floor), and what does lowering files.openCostInBytes buy on
  * narrow-map queries? args: openCostBytes q1,q2,...
  */
object ProfileSplit {
  def main(args: Array[String]): Unit = {
    val openCost = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", openCost)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(100).count()
    val docs = graft.sources.Tables.documents(spark, dir)
    println(s"openCost=$openCost documents scan partitions = " +
      docs.rdd.getNumPartitions)
    for (n <- args(1).split(",")) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      println(f"$n%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$c")
    }
    spark.stop()
  }
}
