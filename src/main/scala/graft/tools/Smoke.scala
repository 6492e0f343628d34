package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's t1 gate: runs
  * `SparkEntry.entry` on sf0.001 and prints the result. Also prints the
  * formatted physical plan so scan pushdown / codegen spans can be
  * eyeballed after every change.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.explain("formatted")
    df.show(20, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
