package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Enrich
import graft.dedup.Dedup
import graft.sources.Tables

/** r17 (session 2): the prefix miner's rarest-first selection is a
  * per-doc window (exchange + full sort + WindowExec). A/B it against
  * an aggregation-based selection (collect_list + array_sort + slice)
  * that keeps the exchange but drops the full sort.
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
    def current() = Dedup.ngramJaccardPairsPrefix(docs, col("doc_id"), t)
    // identical selection, aggregation-based: per doc the kept set is
    // the k smallest (df, shingle) pairs, k = n_sh - ceil(n_sh*j) + 1;
    // sh is a sorted DISTINCT hash array so the order is total and
    // slice(array_sort(...), 1, k) keeps exactly the window's rows
    def aggSel() = {
      val minJaccard = 0.5
      val base = docs.select(col("doc_id").as("id"),
        Dedup.shingleHashes(t, 3).as("sh")).localCheckpoint()
      val inv = base.select(col("id"), explode(col("sh")).as("shingle"))
      val freq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      val ranked = inv.join(freq, "shingle")
        .groupBy("id")
        .agg(array_sort(collect_list(struct(col("df"), col("shingle"))))
          .as("ranked"))
      val prefix = ranked.select(col("id"),
          explode(slice(col("ranked"), lit(1),
            (size(col("ranked")) -
              ceil(size(col("ranked")) * minJaccard) + 1).cast("int")))
            .as("r"))
        .select(col("id"), col("r.shingle").as("shingle"))
      val cands = prefix.as("l")
        .join(prefix.as("r"), col("l.shingle") === col("r.shingle")
          && col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .distinct()
      cands
        .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          Dedup.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
        .where(col("jaccard") >= minJaccard)
    }
    time("window 1")(current())
    time("window 2")(current())
    time("aggsel 1")(aggSel())
    time("aggsel 2")(aggSel())
    // result equivalence on the full corpus
    val a = current().select("id_a", "id_b", "jaccard")
    val b = aggSel().select("id_a", "id_b", "jaccard")
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    println(s"equivalence: onlyWindow=$onlyA onlyAgg=$onlyB")
    spark.stop()
  }
}
