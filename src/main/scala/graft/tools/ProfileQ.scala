package graft.tools

import org.apache.spark.sql.SparkSession

/** r17 session-3 triage: generic per-query job timeline. Runs one
  * declared query (args: name, dir, [repeats]) with a listener that
  * records every Spark job's (start, end, description|callsite), then
  * prints total wall, summed job wall, the UNION of job intervals
  * (concurrent jobs collapse), and the largest driver-only gaps — the
  * split that says whether a row is executor-bound or driver-bound.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq // one or many (comma-separated)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val s: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, (e.time,
            Option(e.properties.getProperty("spark.job.description"))
              .orElse(Option(e.properties.getProperty("callSite.short")))
              .filter(_.nonEmpty).getOrElse("?")))
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobs.remove(e.jobId)).foreach { case (t0, d) =>
            done.synchronized { done += ((t0, e.time, d)) }
          }
      })
    s.range(100).count() // minimal warmup; rep 1 absorbs the rest
    for (name <- names; r <- 1 to reps) {
      done.synchronized(done.clear())
      val t0 = System.currentTimeMillis()
      val n = graft.SparkEntry.queries(name)(s, dir)
        .queryExecution.toRdd.count()
      val t1 = System.currentTimeMillis()
      Thread.sleep(300)
      val d = done.synchronized(done.toSeq).sortBy(_._1)
      val wall = (t1 - t0) / 1e3
      val jobSum = d.map(j => j._2 - j._1).sum / 1e3
      // union of job intervals = seconds with >=1 job in flight
      var covered = 0L
      var curS = -1L; var curE = -1L
      d.foreach { case (a, b, _) =>
        if (a > curE) { if (curE > 0) covered += curE - curS; curS = a; curE = b }
        else if (b > curE) curE = b
      }
      if (curE > 0) covered += curE - curS
      println(f"$name rep $r: rows=$n wall=$wall%.2f jobs=${d.size} " +
        f"jobSum=$jobSum%.2f jobUnion=${covered / 1e3}%.2f " +
        f"driverOnly=${wall - covered / 1e3}%.2f")
      if (r == reps) {
        // largest gaps between consecutive job intervals (driver-only)
        val gaps = (Seq((t0, t0, "start")) ++ d :+ ((t1, t1, "end")))
          .sliding(2).collect { case Seq((_, e1, d1), (s2, _, d2)) if s2 > e1 =>
            (s2 - e1, d1, d2)
          }.toSeq.sortBy(-_._1).take(12)
        gaps.foreach { case (ms, before, after) =>
          println(f"  gap ${ms / 1e3}%6.2fs after [${before.take(60)}] " +
            f"before [${after.take(60)}]")
        }
        d.sortBy(j => -(j._2 - j._1)).take(10).foreach { case (a, b, desc) =>
          println(f"  job ${(b - a) / 1e3}%6.2fs ${desc.take(80)}")
        }
      }
    }
    s.stop()
  }
}
