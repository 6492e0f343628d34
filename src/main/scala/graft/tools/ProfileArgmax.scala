package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B: the argmax-by-struct aggregates (min/max over a struct
  * buffer) plan as SortAggregate — the struct buffer disqualifies
  * HashAggregate — so the quadratic pair streams and the gram
  * election pay a full per-partition sort. Price that sort by timing
  * the committed shape against a packed-primitive proxy (exact only
  * at fixture ranges; the proxy is for MEASUREMENT, not for shipping).
  */
object ProfileArgmax {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }

    // ---- triplets_hard pair stream (cross-label BNLJ, ~3.6M pairs) ----
    val emb = Tables.embeddings(spark, dir)
    val base = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<float>").as("emb"),
        col("label").cast("long").as("label"))
      .where(col("id").isNotNull && col("emb").isNotNull)
    def negPairs = base.as("a")
      .join(base.as("b"), col("a.label") =!= col("b.label"))
      .select(col("a.id").as("anchor"), col("b.id").as("cand"),
        col("b.label").as("neg_label"),
        round(graft.vector.VectorKernels.cosine(col("a.emb"), col("b.emb")), 4)
          .as("sim"))
    def negPairsNoRound = base.as("a")
      .join(base.as("b"), col("a.label") =!= col("b.label"))
      .select(col("a.id").as("anchor"), col("b.id").as("cand"),
        col("b.label").as("neg_label"),
        graft.vector.VectorKernels.cosine(col("a.emb"), col("b.emb"))
          .as("sim"))
    for (r <- 1 to 3) {
      time(s"pairs-only rep$r") { // BNLJ + cosine, no argmax: count sink
        negPairs.groupBy().count().queryExecution.toRdd.count()
      }
      time(s"sum-raw-cosine rep$r") { // cosine forced, no round, no grp
        negPairsNoRound.groupBy().agg(sum("sim"))
          .queryExecution.toRdd.count()
      }
      time(s"sum-rounded rep$r") { // adds round(,4): BigDecimal per pair?
        negPairs.groupBy().agg(sum("sim")).queryExecution.toRdd.count()
      }
      time(s"hashagg-noround rep$r") { // full packed argmax, raw cosine
        negPairsNoRound.groupBy(col("anchor"))
          .agg(max(struct(col("sim"), (-col("cand")).as("__nc"),
            col("neg_label"))).as("__m"))
          .queryExecution.toRdd.count()
      }
      time(s"struct-argmax rep$r") { // the committed bestNeg shape
        negPairs.groupBy(col("anchor"))
          .agg(max(struct(col("sim"), (-col("cand")).as("__nc"),
            col("neg_label"))).as("__m"))
          .queryExecution.toRdd.count()
      }
      time(s"packed-argmax rep$r") { // HashAggregate proxy: sim 4dp in
        // [-1,1] -> int in [-10000,10000]; ids < 2^20 at fixture scale
        negPairs.groupBy(col("anchor"))
          .agg(max((col("sim") * 10000).cast("long") * 1099511627776L -
            col("cand") * 1024L + col("neg_label")).as("p"))
          .queryExecution.toRdd.count()
      }
    }

    // ---- spans gram election (string gram key, ~1M seed rows) ----
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      split(trim(col("text")), "\\s+").as("t"))
    val n = 8
    def seeds = toks
      .where(size(col("t")) >= n)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("t")) - n),
          i => struct(i.as("pos"),
            array_join(slice(col("t"), i + 1, lit(n)), " ").as("gram")))).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.gram").as("gram"))
    for (r <- 1 to 3) {
      time(s"seeds-only rep$r") {
        seeds.groupBy().count().queryExecution.toRdd.count()
      }
      time(s"gram struct-elect rep$r") { // committed winner election
        seeds.groupBy("gram")
          .agg(count(lit(1)).as("occ"),
            min(struct(col("doc_id"), col("pos"))).as("w"))
          .where(col("occ") >= 2)
          .queryExecution.toRdd.count()
      }
      time(s"gram packed-elect rep$r") { // HashAggregate proxy
        seeds.groupBy("gram")
          .agg(count(lit(1)).as("occ"),
            min(col("doc_id") * 2097152L + col("pos")).as("w"))
          .where(col("occ") >= 2)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
