package graft

import org.apache.spark.sql.SparkSession

/** Measurement tooling (optimization rounds, guide §1): alternate two conf
  * sets over the same queries INSIDE ONE JVM and report per-query medians,
  * so JIT/GC/session noise that dominates short fresh-JVM subset benches
  * cancels out. The bench contract is untouched — this is a diagnosis
  * main, never run by the driver.
  *
  * Usage: ABBench <sfDir> <ignored> <namePatterns>
  *   env AB_CONF_A / AB_CONF_B: comma-separated k=v session confs
  *   env AB_ITERS: alternations per side (default 3)
  */
object ABBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val pats = (if (args.length > 2) args(2) else args(1))
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    def confOf(env: String): Seq[(String, String)] =
      sys.env.getOrElse(env, "").split(',').map(_.trim).filter(_.contains("="))
        .map { kv => val i = kv.indexOf('='); kv.take(i) -> kv.drop(i + 1) }.toSeq
    val confA = confOf("AB_CONF_A")
    val confB = confOf("AB_CONF_B")
    val iters = sys.env.getOrElse("AB_ITERS", "3").toInt
    val spark = Sessions.local()
    val selected = SparkEntry.queries.filter { case (n, _) => pats.exists(n.contains) }

    def withConf[A](cs: Seq[(String, String)])(body: => A): A = {
      val prev = cs.map { case (k, _) => k -> spark.conf.getOption(k) }
      cs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach { case (k, p) =>
        p.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up under each conf so first-run codegen/scan costs hit neither side
    selected.foreach { case (_, fn) =>
      withConf(confA)(runOnce(fn)); withConf(confB)(runOnce(fn))
    }
    val results = selected.map { case (name, fn) =>
      val as = Seq.newBuilder[Double]; val bs = Seq.newBuilder[Double]
      (1 to iters).foreach { _ =>
        as += withConf(confA)(runOnce(fn))
        bs += withConf(confB)(runOnce(fn))
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      (name, med(as.result()), med(bs.result()))
    }
    println(f"${"query"}%-34s ${"A_med"}%8s ${"B_med"}%8s ${"B/A"}%6s")
    results.foreach { case (n, a, b) =>
      println(f"$n%-34s $a%8.3f $b%8.3f ${b / a}%6.3f")
    }
    val ta = results.map(_._2).sum; val tb = results.map(_._3).sum
    println(f"TOTAL A=$ta%.3f B=$tb%.3f B/A=${tb / ta}%.3f")
    spark.stop()
  }
}
