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
    for (n <- Seq("q_maxsim_retrieval", "q_maxsim_ivf_full_probe",
        "q_quantile_sketch_grouped", "curation_length_pctl",
        "q_heavy_hitters_grouped", "mldata_cdc_apply")) {
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
