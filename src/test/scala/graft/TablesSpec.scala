package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins against driver testdata regenerations (r6/r7: `events.ts` silently
  * became parquet `timestamp[us]`-no-tz → TIMESTAMP_NTZ → every
  * `unix_micros(ts)` call site threw at analysis and two queries vanished
  * from the correctness report). A future physical-encoding change must
  * fail HERE, in-repo, not in the driver.
  */
class TablesSpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(s => s"/root/testdata/$s")
    .filter(d => new java.io.File(s"$d/events.parquet").exists())

  test("events.ts normalizes to session-zoned TIMESTAMP at every scale factor") {
    assert(sfDirs.nonEmpty, "no testdata sf dirs found")
    sfDirs.foreach { d =>
      val dt = Tables.t(spark, d, "events").schema("ts").dataType
      assert(dt == TimestampType, s"$d/events.parquet ts read as $dt, expected TIMESTAMP")
    }
  }

  test("no table exposes TIMESTAMP_NTZ in any column") {
    sfDirs.foreach { d =>
      Tables.all.foreach { n =>
        if (new java.io.File(s"$d/$n.parquet").exists()) {
          val ntz = Tables.t(spark, d, n).schema.filter(_.dataType == TimestampNTZType)
          assert(ntz.isEmpty, s"$d/$n: NTZ columns ${ntz.map(_.name).mkString(", ")}")
        }
      }
    }
  }

  test("unix_micros works on events.ts (the q47/q62 call-site contract)") {
    val df = Tables.t(spark, sfDirs.head, "events")
    val n = df.selectExpr("unix_micros(ts) AS us").filter("us IS NOT NULL").limit(1).count()
    assert(n == 1)
  }
}
