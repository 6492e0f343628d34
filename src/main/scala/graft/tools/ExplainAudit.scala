package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("mldata_upsert_latest", "mldata_snapshot_diff",
        "text_tfidf_topk", "emb_standardize", "emb_random_projection",
        "text_char_entropy", "emb_outlier_scores")) {
      println(s"===== $n =====")
      val plan = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate")
          || l.contains("Window") || l.contains("Scan") || l.contains("Sort")
          || l.contains("Project") && l.contains("Codegen")).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
