package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver harness.
  *
  * All tables are parquet files under an `sfDir` (see TESTDATA.md). Reads go
  * through `spark.read.parquet` so Catalyst gets native parquet scans with
  * filter pushdown + column pruning; at cluster scale these would be
  * partitioned directories and the same code path applies.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table as a DataFrame.
    *
    * Parquet TIMESTAMP(NANOS) (the `events.ts` column) is not a legal Spark
    * type; sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[Sessions.builder]]) and we convert the resulting long to a
    * microsecond timestamp here (integer `div`, no double round-trip).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")))
      .getOrElse(df)
  }

  /** Register every table as a temp view (for SQL-surface queries).
    * Cached per (session, dir): repeated calls would otherwise re-read ten
    * parquet footers per query (round-1 verdict note on q15). Keyed weakly
    * on the session object itself (identity hashes can collide / be
    * recycled; strong keys would pin dead sessions in a long-lived
    * service), and registration happens inside the lock so a concurrent
    * first caller only returns once the views exist.
    */
  private val registered = new java.util.WeakHashMap[SparkSession, String]()

  def register(spark: SparkSession, dir: String): Unit = registered.synchronized {
    if (registered.get(spark) != dir) {
      all.foreach { n =>
        val p = new java.io.File(s"$dir/$n.parquet")
        if (p.exists()) t(spark, dir, n).createOrReplaceTempView(n)
      }
      registered.put(spark, dir)
    }
  }
}
