package graft

/** Measurement tooling (optimization rounds): dump `.explain("formatted")`
  * for the named queries to stdout between BEGIN/END markers, for the
  * committed plans/rNN artifacts. Lifecycle queries build tables under
  * /tmp before returning their final frame, exactly like a bench run.
  *
  * Usage: PlanDump <sfDir> <ignored> <namePatterns>  (run_verify.sh shape)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val pats = (if (args.length > 2) args(2) else args(1))
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val spark = Sessions.local()
    SparkEntry.queries
      .filter { case (n, _) => pats.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          println(s"=== BEGIN $name ===")
          println(plan)
          println(s"=== END $name ===")
        } catch {
          case e: Throwable => println(s"=== FAILED $name: $e ===")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
