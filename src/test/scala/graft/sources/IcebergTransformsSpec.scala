package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.destinations.IcebergWrite

import java.sql.{Date => SqlDate, Timestamp => SqlTimestamp}

/** Iceberg partition transforms ([[IcebergTransforms]]): the spec's
  * Appendix-B murmur3 test vectors (pinned byte-exactly — interop with
  * every other Iceberg engine hangs on these), floor semantics of the
  * temporal transforms across the epoch, truncate code-point rules, and
  * end-to-end write → read → transform-aware pruning over native tables
  * partitioned by `day(ts)` + `bucket(4, id)` with [[IcebergRead]]'s
  * PlanStats pinning that pruning skips MANIFESTS (never opened) and
  * files (never planned).
  */
class IcebergTransformsSpec extends SparkSpec {

  import IcebergTransforms._

  test("murmur3_x86_32 matches the Iceberg spec Appendix-B vectors") {
    // independent witness: the standard algorithm as implemented by the
    // Scala stdlib (murmur3_x86_32 with explicit seed 0)
    val probes = Seq[Array[Byte]](
      Array.emptyByteArray, "a".getBytes("UTF-8"), "iceberg".getBytes("UTF-8"),
      Array[Byte](0, 1, 2, 3), (0 until 17).map(_.toByte).toArray)
    probes.foreach { b =>
      assert(murmur3(b) == scala.util.hashing.MurmurHash3.bytesHash(b, 0),
        s"disagrees with stdlib murmur3 on ${b.length} bytes")
    }
    // spec vectors (iceberg.apache.org/spec, Appendix B)
    assert(hashLong(34L) == 2017239379)                         // int/long 34
    assert(murmur3("iceberg".getBytes("UTF-8")) == 1210000089)  // string
    assert(murmur3(new java.math.BigDecimal("14.20")
      .unscaledValue.toByteArray) == -500754589)                // decimal(9,2)
    assert(hashLong(17486L) == -653330422)                      // date 2017-11-16
    assert(hashLong(1510871468000000L) == -2047944441)          // ts 2017-11-16T22:31:08
    assert(murmur3(Array[Byte](0, 1, 2, 3)) == -188683207)      // fixed/binary
  }

  test("bucket distributes per spec: int and long of equal value agree") {
    assert(bucketLong(34L, 16) == ((2017239379 & Int.MaxValue) % 16))
    // UTF8String path == raw bytes path
    assert(bucketUtf8(org.apache.spark.unsafe.types.UTF8String
      .fromString("iceberg"), 7) == bucketBytes("iceberg".getBytes("UTF-8"), 7))
  }

  test("temporal transforms floor across the epoch") {
    def us(s: String): Long = {
      val i = java.time.Instant.parse(s)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    // 1969-12-31T23:30:00Z → day -1, hour -1, month -1, year -1
    assert(applyScalar(Day, TimestampType, us("1969-12-31T23:30:00Z")) == Some(-1))
    assert(applyScalar(Hour, TimestampType, us("1969-12-31T23:30:00Z")) == Some(-1))
    assert(applyScalar(Month, TimestampType, us("1969-12-31T23:30:00Z")) == Some(-1))
    assert(applyScalar(Year, TimestampType, us("1969-12-31T23:30:00Z")) == Some(-1))
    // 2017-11-16T22:31:08Z → day 17486, hour 17486*24+22, month 574, year 47
    val t = us("2017-11-16T22:31:08Z")
    assert(applyScalar(Day, TimestampType, t) == Some(17486))
    assert(applyScalar(Hour, TimestampType, t) == Some(17486 * 24 + 22))
    assert(applyScalar(Month, TimestampType, t) == Some((2017 - 1970) * 12 + 10))
    assert(applyScalar(Year, TimestampType, t) == Some(47))
    // date source: internal Int days
    assert(applyScalar(Day, DateType, 17486) == Some(17486))
    assert(applyScalar(Month, DateType, -1) == Some(-1))
  }

  test("timestamp_ntz (Iceberg `timestamp`) binned by wall-clock micros") {
    def us(s: String): Long = {
      val ldt = java.time.LocalDateTime.parse(s)
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
    }
    val t = us("2017-11-16T22:31:08")
    assert(applyScalar(Day, TimestampNTZType, t) == Some(17486))
    assert(applyScalar(Hour, TimestampNTZType, t) == Some(17486 * 24 + 22))
    assert(applyScalar(Month, TimestampNTZType, t) ==
      Some((2017 - 1970) * 12 + 10))
    assert(applyScalar(Year, TimestampNTZType, t) == Some(47))
    // bucket hashes the same 8-byte long layout as tz timestamps
    assert(applyScalar(Bucket(16), TimestampNTZType, 1510871468000000L) ==
      applyScalar(Bucket(16), TimestampType, 1510871468000000L))
    validate(Day, TimestampNTZType, "ts")
    validate(Hour, TimestampNTZType, "ts")
    // write-side derived column agrees with the scalar path, regardless of
    // the session zone (EXPLICIT-UTC cast inside column())
    val old = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      import org.apache.spark.sql.functions._
      val df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2017-11-16 22:31:08' AS ts")
      val got = df.select(
        IcebergTransforms.column(Day, col("ts"), TimestampNTZType).as("d"),
        IcebergTransforms.column(Hour, col("ts"), TimestampNTZType).as("h"),
        IcebergTransforms.column(Bucket(4), col("ts"), TimestampNTZType)
          .as("b")).head()
      assert(got.getDate(0).toLocalDate ==
        java.time.LocalDate.ofEpochDay(17486))
      assert(got.getInt(1) == 17486 * 24 + 22)
      assert(got.getInt(2) == bucketLong(1510871468000000L, 4))
    } finally spark.conf.set("spark.sql.session.timeZone", old)
  }

  test("truncate floors negatives and counts code points") {
    assert(applyScalar(Truncate(10), IntegerType, 7) == Some(0))
    assert(applyScalar(Truncate(10), IntegerType, -3) == Some(-10))
    assert(applyScalar(Truncate(10), LongType, -10L) == Some(-10L))
    assert(truncateString("iceberg", 3) == "ice")
    assert(truncateString("ab", 5) == "ab")
    // one astral code point (surrogate PAIR in UTF-16) counts as ONE
    val astral = "a😀b" // a, U+1F600, b
    assert(truncateString(astral, 2) == "a😀")
  }

  // r17 (ADVICE): Iceberg bounds order is unsigned UTF-8 bytes = code
  // points. UTF-16 compareTo inverts BMP U+E000..U+FFFF vs astral chars.
  test("cmp orders strings by code point (UTF-8 byte order), not UTF-16") {
    val bmpHigh = "�"   // U+FFFD, single UTF-16 unit 0xFFFD
    val astral = "😀" // U+1F600, surrogate pair (UTF-16 lead 0xD83D)
    assert(bmpHigh.compareTo(astral) > 0, "UTF-16 order puts U+FFFD above")
    assert(cmp(bmpHigh, astral) < 0, "code-point order puts U+1F600 above")
    assert(cmp(astral, bmpHigh) > 0)
    // prefix ordering and equality unchanged
    assert(cmp("ab", "abc") < 0)
    assert(cmp("abc", "abc") == 0)
    assert(cmp("b", "a") > 0)
  }

  private def mkRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(i.toLong,
      SqlTimestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(i * 43200L)), // two rows per day
      s"doc-$i")
  }

  private val tsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("body", StringType)))

  test("native table partitioned by day(ts) + bucket(4, id): write, read back, prune") {
    val t = tmpDir("ice-transform-rw").resolve("t").toString
    IcebergWrite.create(spark, t, tsSchema,
      partitionBy = Seq("day(ts)", "bucket(4, id)"))
    val rows = mkRows(8) // 4 distinct days, ids 0..7
    IcebergWrite.append(spark, t, spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), tsSchema))

    // full read returns every row with source columns intact (the data
    // files must carry ts and id — transforms are not invertible)
    val back = IcebergRead.read(spark, t)
    assert(back.schema.fieldNames.toSeq == Seq("id", "ts", "body"))
    val got = back.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == rows.map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet)

    // spec JSON carries the transforms
    val fs = new Path(t).getFileSystem(spark.sessionState.newHadoopConf())
    val md = IcebergRead.currentMetadata(
      fs, new Path(fs.makeQualified(new Path(t)), "metadata"))
    val spec = md.get("partition-specs").get(0).get("fields")
    assert(spec.get(0).get("transform").asText() == "day")
    assert(spec.get(1).get("transform").asText() == "bucket[4]")

    // pruning through day(): a one-day window plans only that day's files
    val oneDay = IcebergRead.read(spark, t, IcebergRead.Options(
      where = Some("ts >= TIMESTAMP'2024-01-02 00:00:00Z' AND " +
        "ts < TIMESTAMP'2024-01-03 00:00:00Z'")))
    val stats = IcebergRead.lastPlanStats.get
    assert(stats.dataFilesPlanned < stats.dataFilesSeen,
      s"day() pruning planned everything: $stats")
    val pruned = oneDay.filter(
      "ts >= TIMESTAMP'2024-01-02 00:00:00Z' AND ts < TIMESTAMP'2024-01-03 00:00:00Z'")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == Set(2L, 3L))

    // pruning through bucket(): id = 5 plans at most the one bucket's files
    IcebergRead.read(spark, t, IcebergRead.Options(where = Some("id = 5")))
    val bstats = IcebergRead.lastPlanStats.get
    assert(bstats.dataFilesPlanned < bstats.dataFilesSeen,
      s"bucket() pruning planned everything: $bstats")
  }

  test("manifest-level pruning: non-overlapping manifests are never opened (pinned)") {
    val t = tmpDir("ice-manifest-prune").resolve("t").toString
    IcebergWrite.create(spark, t, tsSchema, partitionBy = Seq("day(ts)"))
    def append(startDay: String, n: Int): Unit = {
      val base = java.time.Instant.parse(s"${startDay}T00:00:00Z")
      val rows = (0 until n).map(i =>
        Row(i.toLong, SqlTimestamp.from(base.plusSeconds(i * 86400L)), s"d$i"))
      IcebergWrite.append(spark, t, spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), tsSchema))
    }
    append("2024-01-01", 3) // manifest 1: days 0..2 of Jan
    append("2024-06-01", 3) // manifest 2: days in June
    append("2024-12-01", 3) // manifest 3: days in December

    val res = IcebergRead.read(spark, t, IcebergRead.Options(
      where = Some("ts >= TIMESTAMP'2024-06-01 00:00:00Z' AND " +
        "ts < TIMESTAMP'2024-07-01 00:00:00Z'")))
    val stats = IcebergRead.lastPlanStats.get
    assert(stats.manifestsTotal == 3, stats.toString)
    // THE PIN: only the June manifest is ever opened
    assert(stats.manifestsOpened == 1, stats.toString)
    assert(res.count() == 3L)

    // equality through day(): one day hits one manifest
    IcebergRead.read(spark, t, IcebergRead.Options(
      where = Some("ts = TIMESTAMP'2024-12-02 00:00:00Z'")))
    assert(IcebergRead.lastPlanStats.get.manifestsOpened == 1)

    // no predicate: everything opens
    IcebergRead.read(spark, t)
    assert(IcebergRead.lastPlanStats.get.manifestsOpened == 3)
  }

  test("truncate(3, s) partitioning round-trips and prunes by prefix range") {
    val t = tmpDir("ice-trunc").resolve("t").toString
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("v", LongType)))
    IcebergWrite.create(spark, t, schema, partitionBy = Seq("truncate(3, s)"))
    import spark.implicits._
    IcebergWrite.append(spark, t,
      Seq(("apple", 1L), ("apric", 2L), ("banana", 3L), ("cherry", 4L))
        .toDF("s", "v"))
    val got = IcebergRead.read(spark, t).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("apple", 1L), ("apric", 2L), ("banana", 3L), ("cherry", 4L)))

    IcebergRead.read(spark, t, IcebergRead.Options(where = Some("s = 'banana'")))
    val stats = IcebergRead.lastPlanStats.get
    assert(stats.dataFilesPlanned < stats.dataFilesSeen, stats.toString)

    // range predicate maps through the monotone prefix transform
    val r = IcebergRead.read(spark, t,
      IcebergRead.Options(where = Some("s >= 'b'"))).filter("s >= 'b'")
    assert(r.collect().map(_.getString(0)).toSet == Set("banana", "cherry"))
    assert(IcebergRead.lastPlanStats.get.dataFilesPlanned <
      IcebergRead.lastPlanStats.get.dataFilesSeen)
  }

  test("year/month partitioning over a DATE column with nulls") {
    val t = tmpDir("ice-ym").resolve("t").toString
    val schema = StructType(Seq(
      StructField("d", DateType), StructField("v", LongType)))
    IcebergWrite.create(spark, t, schema, partitionBy = Seq("month(d)"))
    val rows = Seq(
      Row(SqlDate.valueOf("2023-02-10"), 1L),
      Row(SqlDate.valueOf("2024-03-05"), 2L),
      Row(null, 3L))
    IcebergWrite.append(spark, t, spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema))
    val all = IcebergRead.read(spark, t).collect()
      .map(r => (Option(r.getDate(0)).map(_.toString), r.getLong(1))).toSet
    assert(all == Set((Some("2023-02-10"), 1L), (Some("2024-03-05"), 2L), (None, 3L)))

    // IS NULL keeps only the null partition's file
    val nulls = IcebergRead.read(spark, t,
      IcebergRead.Options(where = Some("d IS NULL"))).filter("d IS NULL")
    assert(nulls.count() == 1L)
    val stats = IcebergRead.lastPlanStats.get
    assert(stats.dataFilesPlanned < stats.dataFilesSeen, stats.toString)

    // month equality prunes to one file
    IcebergRead.read(spark, t, IcebergRead.Options(where = Some("d = DATE'2024-03-05'")))
    assert(IcebergRead.lastPlanStats.get.dataFilesPlanned == 1)
  }

  test("rewriteDataFiles recomputes transform tuples (compaction keeps pruning exact)") {
    val t = tmpDir("ice-transform-rewrite").resolve("t").toString
    IcebergWrite.create(spark, t, tsSchema, partitionBy = Seq("day(ts)"))
    IcebergWrite.append(spark, t, spark.createDataFrame(
      spark.sparkContext.parallelize(mkRows(4), 2), tsSchema))
    IcebergWrite.rewriteDataFiles(spark, t)
    val res = IcebergRead.read(spark, t, IcebergRead.Options(
      where = Some("ts >= TIMESTAMP'2024-01-02 00:00:00Z'")))
      .filter("ts >= TIMESTAMP'2024-01-02 00:00:00Z'")
    assert(res.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    val stats = IcebergRead.lastPlanStats.get
    assert(stats.dataFilesPlanned <= stats.dataFilesSeen)
  }

  test("create refuses incompatible transform/source pairs loudly") {
    val t = tmpDir("ice-transform-refuse").resolve("t").toString
    intercept[IllegalArgumentException] {
      IcebergWrite.create(spark, t + "1", tsSchema, Seq("hour(body)"))
    }
    intercept[IllegalArgumentException] {
      IcebergWrite.create(spark, t + "2", tsSchema, Seq("truncate(3, ts)"))
    }
    intercept[IllegalArgumentException] {
      IcebergWrite.create(spark, t + "3", tsSchema, Seq("bucket(0, id)"))
    }
    intercept[IllegalArgumentException] {
      IcebergWrite.create(spark, t + "4", tsSchema, Seq("frobnicate(id)"))
    }
  }

  test("IcebergBucket expression stays codegen'd and null-safe") {
    import spark.implicits._
    // null-safety via eval path (local relation constant-folds)
    val nulls = Seq(Some(34L), None).toDF("v")
      .select(org.apache.spark.sql.GraftShims.column(
        IcebergBucket(org.apache.spark.sql.GraftShims.convertedExpression(
          col("v")), 16)).as("b")).collect()
    assert(nulls(0).getInt(0) == (2017239379 & Int.MaxValue) % 16)
    assert(nulls(1).isNullAt(0))
    // codegen path over a real (non-foldable) input: values AND span
    val df = spark.range(0, 100)
      .select(col("id"), org.apache.spark.sql.GraftShims.column(
        IcebergBucket(org.apache.spark.sql.GraftShims.convertedExpression(
          col("id")), 8)).as("b"))
    df.collect().foreach(r =>
      assert(r.getInt(1) == bucketLong(r.getLong(0), 8)))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("[codegen id :"), plan) // whole-stage span marker
  }
}
