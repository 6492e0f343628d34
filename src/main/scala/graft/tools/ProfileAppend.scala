package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 session-3: price the bucketed `saveAsTable` APPEND wrapper —
  * wall around the call vs the Spark-job wall inside it — to decide
  * whether "direct bucketed-file writes" (not-yet-optimized item 1c)
  * is worth its on-disk-protocol risk. Appends a small cached frame
  * repeatedly, the registry-gate shape (repartition to buckets +
  * bucketBy/sortBy + append saveAsTable), and prints per-append wall,
  * in-job wall, and the driver-side remainder.
  */
object ProfileAppend {
  def main(args: Array[String]): Unit = {
    val s: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val done = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, e.time)
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobs.remove(e.jobId)).foreach { t0 =>
            done.synchronized { done += ((t0, e.time)) }
          }
      })
    val tmp = graft.TempDirs.create("profappend").toString
    val buckets = 8
    val tbl = "graft_profappend_tbl"
    import s.implicits._
    val batch = (1L to 2000L).map(i => (i * 7919 % 100000, i))
      .toDF("band_key", "id").cache()
    batch.count()
    s.range(10).count()
    for (b <- 0 until 8) {
      done.synchronized(done.clear())
      val t0 = System.currentTimeMillis()
      batch.withColumn("batch_id", lit(b.toLong))
        .repartition(buckets, pmod(hash(col("band_key")), lit(buckets)))
        .write.mode("append").format("parquet").option("path", s"$tmp/t")
        .bucketBy(buckets, "band_key").sortBy("band_key")
        .saveAsTable(tbl)
      val t1 = System.currentTimeMillis()
      Thread.sleep(200)
      val d = done.synchronized(done.toSeq)
      val jobWall = d.map(j => j._2 - j._1).sum / 1e3
      println(f"append $b: wall=${(t1 - t0) / 1e3}%.3f jobWall=$jobWall%.3f " +
        f"driverSide=${(t1 - t0) / 1e3 - jobWall}%.3f jobs=${d.size}")
    }
    // reference: the same shuffle+write WITHOUT the table command
    // (plain parquet dir, no bucket naming, no catalog) — bounds the
    // non-negotiable write cost
    for (b <- 0 until 4) {
      done.synchronized(done.clear())
      val t0 = System.currentTimeMillis()
      batch.withColumn("batch_id", lit(100L + b))
        .repartition(buckets, pmod(hash(col("band_key")), lit(buckets)))
        .write.mode("append").parquet(s"$tmp/plain")
      val t1 = System.currentTimeMillis()
      Thread.sleep(200)
      val d = done.synchronized(done.toSeq)
      val jobWall = d.map(j => j._2 - j._1).sum / 1e3
      println(f"plain  $b: wall=${(t1 - t0) / 1e3}%.3f jobWall=$jobWall%.3f " +
        f"driverSide=${(t1 - t0) / 1e3 - jobWall}%.3f jobs=${d.size}")
    }
    s.stop()
  }
}
