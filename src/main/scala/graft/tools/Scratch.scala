package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val names = if (args.nonEmpty) args.toSeq else Seq("p07_pipeline_json_ops")
    // warm-up + 2 timed reps per query
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"TIMING $n rep$rep $sec%.3f s")
      }
    }
    spark.stop()
  }
}
