package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the parquet IN-pushdown stack cliff: Spark folds a pushed
  * IN's values with `reduceLeft(FilterApi.or)`, a linear predicate
  * chain whose recursion depth equals the value count — past the task
  * thread's stack it is a StackOverflowError INSIDE the reader, not a
  * graceful fallback. Result on this JVM (1 MB stacks): 1024 ok, 2048
  * fails. [[graft.streaming.MaintainedScreen.raiseInPushdown]] pins
  * its threshold 4× under the measured cliff; re-run this probe
  * before raising it.
  */
object InPushProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.TempDirs.create("inpush").toString + "/t"
    spark.range(2000000).select(xxhash64(col("id").cast("string")).as("h"))
      .sort("h").write.parquet(dir)
    for (n <- Seq(256, 512, 1024, 2048, 4096, 8192)) {
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", n.toString)
      val vals = (0 until n).map(i => i.toLong * 7919L)
      try {
        val c = spark.read.parquet(dir).where(col("h").isin(vals: _*)).count()
        println(s"n=$n ok count=$c")
      } catch { case e: Throwable => println(s"n=$n FAILED ${e.getClass}") }
    }
    spark.stop()
  }
}
