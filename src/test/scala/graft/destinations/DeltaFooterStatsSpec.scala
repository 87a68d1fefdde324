package graft.destinations

import graft.SparkSpec
import graft.sources.DeltaLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the small-commit footer stats path byte-equal to the distributed
  * scan path (r18 `computeStatsDispatch`): the dispatch is pure routing,
  * so the stats JSON a commit logs must be IDENTICAL whichever side ran —
  * anything the footer cannot reproduce exactly must refuse (None) and
  * fall back, never approximate.
  */
class DeltaFooterStatsSpec extends SparkSpec {

  private def addsOf(table: java.nio.file.Path): Seq[DeltaWrite.AddDescriptor] =
    DeltaLog.snapshot(spark, table.toString).files.map { a =>
      DeltaWrite.AddDescriptor(
        DeltaLog.decodePath(a.path),
        a.partitionValues.toSeq.sortBy(_._1).map { case (k, v) => k -> Option(v) },
        a.size, a.modificationTime)
    }

  private def bothPaths(table: java.nio.file.Path, dataSchema: StructType)
      : (Option[Map[String, String]], Map[String, String]) = {
    val adds = addsOf(table)
    val tp = new Path(table.toString)
    (DeltaWrite.footerStats(spark, tp, adds, dataSchema),
      DeltaWrite.computeStats(spark, tp, adds, dataSchema))
  }

  test("footer path equals the scan path byte-for-byte on a mixed-type table") {
    import spark.implicits._
    val dir = tmpDir("dfs-mixed")
    val t = dir.resolve("t")
    // strings past the 32-char truncation prefix, non-ASCII + supplementary
    // chars, negative/zero doubles, decimals at scale, dates, booleans,
    // nulls in every column, plus an ALL-NULL column
    val df = Seq(
      (1L, Some(7), Some("alpha"), Some(1.5d), Some(BigDecimal("12.34")),
        Some(java.sql.Date.valueOf("2024-01-05")), Some(true), Option.empty[String]),
      (2L, None, Some("z" * 40), Some(-0.0d), Some(BigDecimal("-999.99")),
        Some(java.sql.Date.valueOf("1969-12-31")), Some(false), Option.empty[String]),
      (3L, Some(-4), Some("héllo→𐍈" + ("y" * 30)), None, None,
        None, None, Option.empty[String]),
      (4L, Some(0), None, Some(2.25d), Some(BigDecimal("0.01")),
        Some(java.sql.Date.valueOf("2031-08-17")), Some(true), Option.empty[String])
    ).toDF("id", "small", "name", "x", "dec", "d", "flag", "allnull")
      .withColumn("dec", col("dec").cast(DecimalType(8, 2)))
    DeltaWrite.createIfAbsent(spark, t.toString,
      df.schema.asInstanceOf[StructType])
    DeltaWrite.append(spark, t.toString, df.repartition(2))

    val (footer, scan) = bothPaths(t, df.schema.asInstanceOf[StructType])
    assert(footer.isDefined, "footer path must engage on a clean mixed-type table")
    assert(footer.get.keySet === scan.keySet)
    footer.get.foreach { case (rel, json) =>
      assert(json === scan(rel), s"stats diverge for $rel")
    }
    // sanity: the JSON really carries the truncated bounds + null counts
    val one = scan.values.find(_.contains("minValues")).get
    assert(one.contains("nullCount"))
  }

  test("timestamp columns refuse the footer path (INT96 footer stats)") {
    import spark.implicits._
    val dir = tmpDir("dfs-ts")
    val t = dir.resolve("t")
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts")
    DeltaWrite.createIfAbsent(spark, t.toString, df.schema.asInstanceOf[StructType])
    DeltaWrite.append(spark, t.toString, df)
    val (footer, scan) = bothPaths(t, df.schema.asInstanceOf[StructType])
    assert(footer.isEmpty, "timestamp schema must fall back to the scan")
    assert(scan.nonEmpty)
  }

  test("pre-Gregorian-cutover dates refuse the footer path (r19)") {
    import spark.implicits._
    val dir = tmpDir("dfs-julian")
    val t = dir.resolve("t")
    // 1500-01-01 renders differently under the scan's hybrid java.sql.Date
    // and the footer's proleptic LocalDate — the footer must refuse so the
    // logged stats stay exactly the scan's
    val df = Seq(
      (1L, java.sql.Date.valueOf("1500-01-01")),
      (2L, java.sql.Date.valueOf("2024-06-01")))
      .toDF("id", "d")
    DeltaWrite.createIfAbsent(spark, t.toString, df.schema.asInstanceOf[StructType])
    DeltaWrite.append(spark, t.toString, df.repartition(1))
    val (footer, scan) = bothPaths(t, df.schema.asInstanceOf[StructType])
    assert(footer.isEmpty, "pre-cutover dates must fall back to the scan")
    assert(scan.nonEmpty)
    // modern-date tables keep the footer fast path
    val t2 = dir.resolve("t2")
    val df2 = Seq((1L, java.sql.Date.valueOf("1583-01-01"))).toDF("id", "d")
    DeltaWrite.createIfAbsent(spark, t2.toString, df2.schema.asInstanceOf[StructType])
    DeltaWrite.append(spark, t2.toString, df2.repartition(1))
    val (footer2, scan2) = bothPaths(t2, df2.schema.asInstanceOf[StructType])
    assert(footer2.isDefined)
    footer2.get.foreach { case (rel, json) => assert(json === scan2(rel)) }
  }

  test("NaN/Infinity doubles: dispatch output equals the scan output") {
    import spark.implicits._
    val dir = tmpDir("dfs-nan")
    val t = dir.resolve("t")
    val df = Seq(
      (1L, Double.NaN), (2L, 3.5d),
      (3L, Double.PositiveInfinity), (4L, -2.0d))
      .toDF("id", "x")
    DeltaWrite.createIfAbsent(spark, t.toString, df.schema.asInstanceOf[StructType])
    DeltaWrite.append(spark, t.toString, df.repartition(1))
    val (footer, scan) = bothPaths(t, df.schema.asInstanceOf[StructType])
    // either the footer reproduces the scan exactly, or it refuses —
    // both keep the logged stats identical to the scan's
    footer.foreach { m =>
      assert(m.keySet === scan.keySet)
      m.foreach { case (rel, json) => assert(json === scan(rel)) }
    }
  }

  test("partitioned table: per-dir files carry only data-column stats, equal on both paths") {
    import spark.implicits._
    val dir = tmpDir("dfs-part")
    val t = dir.resolve("t")
    val df = (1L to 40L).map(i => (i, s"g${i % 3}", i * 1.5, s"name-$i"))
      .toDF("id", "g", "v", "nm")
    DeltaWrite.createIfAbsent(spark, t.toString,
      df.schema.asInstanceOf[StructType], partitionBy = Seq("g"))
    DeltaWrite.append(spark, t.toString, df.repartition(3))
    val dataSchema = StructType(df.schema.fields.filterNot(_.name == "g"))
    val (footer, scan) = bothPaths(t, dataSchema)
    assert(footer.isDefined)
    assert(footer.get === scan)
  }
}
