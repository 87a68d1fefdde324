package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local()
    val p = SparkEntry.queries("q32_ngram_jaccard")(s, "/root/testdata/sf0.1")
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan") || l.contains("Generate")).mkString("\n"))
    s.stop()
  }
}
