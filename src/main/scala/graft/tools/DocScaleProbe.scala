package graft.tools

import org.apache.spark.sql.SparkSession

/** Multi-scale replay of a named subset of [[graft.SparkEntry.queries]]
  * in ONE JVM — the only comparison this host's ±40% ambient variance
  * permits (r10 adjudication: cross-process ratios are untrustworthy).
  * Used for the 100× documents-only probe of the dedup family: ratios
  * between consecutive scales on fixed cores should track the data
  * ratio (wall ∝ work once all 32 cores are saturated); a growing
  * ratio-of-ratios is a knee.
  *
  * Usage: runMain graft.tools.DocScaleProbe <queriesCsv> <dirsCsv> [outPath]
  */
object DocScaleProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSeq
    val dirs = args(1).split(",").map(_.trim).toSeq
    val outPath = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = graft.SparkEntry.queries
    names.foreach(n => require(qs.contains(n), s"unknown query $n"))
    spark.range(100).count()
    val rows = for (dir <- dirs; name <- names) yield {
      // min of two in-session runs, full materialization (the honest
      // r12 bench action)
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        qs(name)(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$dir%-28s $name%-32s $secs%8.2fs")
      (dir, name, secs)
    }
    val json = "{" + dirs.map { d =>
      s""""$d":{""" + rows.collect { case (`d`, n, s) =>
        s""""$n":${f"$s%.3f"}""" }.mkString(",") + "}"
    }.mkString(",") + "}"
    println(json)
    outPath.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), json.getBytes("UTF-8")))
    spark.stop()
  }
}
