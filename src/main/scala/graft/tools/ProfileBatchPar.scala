package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: how many partitions does a MemoryStream micro-batch
  * carry into foreachBatch, and what does the registry gates' heavy
  * per-batch narrow work (gram seeds / minhash featurize) cost on it
  * as-is vs repartitioned to the session's cores?
  *
  * FINDING (r17 session 5): a MemoryStream batch is ONE partition,
  * and a HOF-shaped minhash is ~6x faster repartitioned — but the
  * SHIPPED featurize is a codegen kernel whose single-task cost is
  * small, and repartitioning the batch made every registry gate
  * SLOWER in paired A/B (both at 32-wide and at the stream's 8-wide
  * shuffle width): the batch feeds ~10 small jobs per micro-batch, so
  * extra partitions multiply task-scheduling cost across all of them
  * and the added round-robin exchange is pure overhead. The engine
  * therefore does NOT parallelize batches; this probe documents why.
  */
object ProfileBatchPar {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq

    def seedsCost(df: DataFrame): Double = {
      val toks = df.select(col("doc_id").cast("long").as("doc_id"),
        split(trim(col("text")), "\\s+").as("t"))
      val n = 8
      val seeds = toks.where(size(col("t")) >= n)
        .select(col("doc_id"), explode(
          transform(sequence(lit(0), size(col("t")) - n),
            i => struct(i.as("pos"),
              array_join(slice(col("t"), i + 1, lit(n)), " ").as("gram"))))
          .as("s"))
        .select(col("doc_id"), col("s.pos").as("pos"),
          col("s.gram").as("gram"))
        .withColumn("h", xxhash64(col("gram")))
      val t0 = System.nanoTime()
      val ck = seeds.localCheckpoint()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(ck)
      dt
    }

    def minhashCost(df: DataFrame): Double = {
      // the neardup gates' featurize shape: shingle set + 64-perm sig
      val sh = graft.dedup.Dedup.shingles(col("text"), 5)
      val t0 = System.nanoTime()
      val n = df.select(col("doc_id"), sh.as("sh"))
        .select(col("doc_id"),
          transform(sequence(lit(0), lit(63)), p =>
            array_min(transform(col("sh"),
              s => xxhash64(concat_ws("|", p.cast("string"), s))))).as("sig"))
        .select(max(element_at(col("sig"), 1))).queryExecution.toRdd.count()
      require(n == 1)
      (System.nanoTime() - t0) / 1e9
    }

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    @volatile var done = false
    val q = ms.toDS().toDF("doc_id", "text").writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val np = batch.rdd.getNumPartitions
        val b32 = batch.repartition(32)
        for (r <- 1 to 3) {
          val a = seedsCost(batch)
          val b = seedsCost(b32)
          val c = minhashCost(batch)
          val d = minhashCost(b32)
          println(f"batch=$batchId parts=$np rep$r seeds as-is=$a%5.2f " +
            f"rep32=$b%5.2f  minhash as-is=$c%5.2f rep32=$d%5.2f")
        }
        done = true
        ()
    }.start()
    ms.addData(rows.take(1700))
    q.processAllAvailable()
    q.stop()
    require(done)
    spark.stop()
  }
}
