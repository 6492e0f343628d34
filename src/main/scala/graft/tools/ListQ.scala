package graft.tools
object ListQ {
  def main(a: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    println("QCOUNT queries: " + qs.size + "  oracles: " + os.size)
    println("QCOUNT no-oracle: " + (qs -- os).toSeq.sorted.mkString(", "))
    qs.toSeq.sorted.foreach(n => println("Q " + n))
  }
}
