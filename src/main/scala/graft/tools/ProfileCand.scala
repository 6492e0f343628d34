package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.sources.Tables

/** r17: does pinning the shingle table (referenced 3x inside
  * ngramJaccardPairsPrefix: inverted index + both verify joins) pay?
  */
object ProfileCand {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = f.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-34s $dt%7.2fs rows=$n")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    spark.range(100).count()
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    docs.count()
    val t = Enrich.dedupContent(col("text"), col("doc_id"))
    // steady-state pairs: run each variant twice
    def current() = Dedup.ngramJaccardPairsPrefix(docs, col("doc_id"), t)
    def pinned() = {
      val base = docs.select(col("doc_id").as("id"),
        Dedup.shingleHashes(t, 3).as("sh")).localCheckpoint()
      val inv = base.select(col("id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("shingle"))
      val freq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("df").asc, col("shingle").asc)
      val prefix = inv.join(freq, "shingle")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= col("n_sh") - ceil(col("n_sh") * 0.5) + 1)
        .select(col("id"), col("shingle"))
      val cands = prefix.as("l")
        .join(prefix.as("r"), col("l.shingle") === col("r.shingle")
          && col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .distinct()
      def floor4(c: org.apache.spark.sql.Column) = floor(c * 10000.0) / 10000.0
      cands
        .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          Dedup.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
        .where(col("jaccard") >= 0.5)
    }
    time("current 1")(current())
    time("current 2")(current())
    time("pinned 1")(pinned())
    time("pinned 2")(pinned())
    spark.stop()
  }
}
