package graft.tools
import org.apache.spark.sql.SparkSession
object SoloQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(args(0))(spark, args(1)).queryExecution.toRdd.count()
    println(f"rows=$n secs=${(System.nanoTime()-t0)/1e9}%.2f")
    spark.stop()
  }
}
