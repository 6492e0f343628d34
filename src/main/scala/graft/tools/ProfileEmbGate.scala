package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** r17 triage: phase timings for the streaming_neardup_emb gate
  * (fixture collect / per-batch / maintenance window) — the gate is
  * the bench's most variable row (11-27s) and the phases say where.
  */
object ProfileEmbGate {
  def main(args: Array[String]): Unit = {
    val s: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // job-level accounting: where do the per-batch seconds go?
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ArrayBuffer[(Double, String)]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, (e.time,
            Option(e.properties.getProperty("spark.job.description"))
              .orElse(Option(e.properties.getProperty("callSite.short")))
              .filter(_.nonEmpty)
              .orElse(e.stageInfos.lastOption.map(si =>
                s"stages=${e.stageInfos.size} ${si.name.take(80)}"))
              .getOrElse("?")))
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobs.remove(e.jobId)).foreach { case (t0j, d) =>
            done.synchronized { done += (((e.time - t0j) / 1e3, d)) }
          }
        }
      })
    // in-JVM sampler: every 100ms classify what the micro-batch
    // (stream execution) thread is doing — codegen, analysis, catalog,
    // job-await — to split the non-job driver seconds per batch.
    val sampleBuckets =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val samplerOn = new java.util.concurrent.atomic.AtomicBoolean(true)
    val sampler = new Thread(() => {
      while (samplerOn.get) {
        val all = Thread.getAllStackTraces
        val it = all.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getKey.getName.startsWith("stream execution thread")) {
            val fr = e.getValue.map(f =>
              f.getClassName + "." + f.getMethodName).mkString(" ")
            val bucket =
              if (fr.contains("janino") || fr.contains("CodeGenerator") ||
                fr.contains("doCompile")) "codegen"
              else if (fr.contains("awaitResult") || fr.contains("runJob") ||
                fr.contains("DAGScheduler")) "await-job"
              else if (fr.contains("RuleExecutor")) "analyze/optimize"
              else if (fr.contains("FileIndex") || fr.contains("listLeafFiles"))
                "file-listing"
              else if (fr.contains("Catalog")) "catalog"
              else if (fr.contains("FileFormatWriter") || fr.contains("commit"))
                "write-commit"
              else if (fr.contains("QueryExecution") ||
                fr.contains("QueryPlanner") || fr.contains("Analyzer") ||
                fr.contains("Optimizer"))
                "plan-other: " + e.getValue.take(4).map(f =>
                  f.getClassName.split("\\.").last + "." +
                    f.getMethodName).mkString(" <- ")
              else fr.split(" ").headOption.getOrElse("?").take(60)
            sampleBuckets.merge(bucket, Integer.valueOf(1),
              (a, b) => Integer.valueOf(a.intValue + b.intValue))
          }
        }
        Thread.sleep(100)
      }
    }, "graft-prof-sampler")
    sampler.setDaemon(true)
    sampler.start()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    s.range(100).count()
    var t0 = System.nanoTime()
    val cm = org.apache.spark.metrics.source.CodegenMetrics
    var cgN = cm.METRIC_COMPILATION_TIME.getCount
    var cgMs = cm.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
    def lap(label: String): Unit = {
      val n = cm.METRIC_COMPILATION_TIME.getCount
      val ms = cm.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs" +
        f"  codegen +${n - cgN}%3d compiles ${(ms - cgMs) / 1e3}%6.2fs")
      cgN = n; cgMs = ms
      t0 = System.nanoTime()
    }
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding"))
    val planted = emb.select((col("id") + 1000000L).as("id"),
      transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
        .as("embedding"))
    val rows = emb.unionAll(planted).as[(Long, Seq[Float])]
      .collect().sortBy(_._1).toSeq
    lap("fixture collect")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val tmp = graft.TempDirs.create("embdedup-prof").toString
    val out = scala.collection.mutable
      .ArrayBuffer[(Long, Option[Long], Option[Double])]()
    val q = graft.streaming.StreamingEmbDedup.embDedupStream(
      ms.toDS().toDF("id", "embedding"), col("id"), col("embedding"),
      s"$tmp/registry", buckets = 8, dim = 64, bands = 8, bits = 16,
      minCosine = 0.9) { bo =>
      out.synchronized {
        out ++= bo.collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      }
    }
    lap("stream start")
    try {
      rows.grouped(rows.length / 3 + 1).zipWithIndex.foreach {
        case (chunk, i) =>
          ms.addData(chunk)
          q.processAllAvailable()
          lap(s"batch $i")
          if (i == 1) {
            graft.streaming.StreamingEmbDedup.maintain(s, s"$tmp/registry")
            lap("maintenance window")
          }
      }
    } finally q.stop()
    lap("stream stop")
    val n = out.toSeq.toDF("id", "dup_of", "cosine").orderBy("id")
      .queryExecution.toRdd.count()
    s.conf.set("spark.sql.shuffle.partitions", prev)
    lap(s"final frame (rows=$n)")
    Thread.sleep(500)
    samplerOn.set(false)
    println("stream-thread samples (100ms each):")
    import scala.jdk.CollectionConverters._
    sampleBuckets.asScala.toSeq.sortBy(-_._2.intValue).take(15).foreach {
      case (k, v) => println(f"  ${v.intValue}%4d  $k")
    }
    println(s"codegen compile time total = " +
      f"${cm.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1e3}%.2f s " +
      s"over ${cm.METRIC_COMPILATION_TIME.getCount} compilations")
    val d = done.synchronized(done.toSeq)
    println(s"jobs=${d.size} total-job-secs=${d.map(_._1).sum}")
    d.sortBy(-_._1).take(30).foreach { case (sec, desc) =>
      println(f"$sec%7.2f  ${desc.take(90)}")
    }
    s.stop()
  }
}
