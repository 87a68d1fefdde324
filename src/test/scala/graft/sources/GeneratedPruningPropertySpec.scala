package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.destinations.DeltaWrite

/** Randomized soundness for generated-column partition pruning: against a
  * table partitioned on `p_date = CAST(ts AS DATE)`, a seeded stream of
  * random predicates (comparisons at random instants including exact
  * midnights, AND/OR combinations, IN lists) must always read back
  * EXACTLY the rows a plain Spark filter selects — the derived partition
  * conjuncts may only remove files that can't match, never rows — and for
  * conjunctive range predicates the pruning must actually bite (strictly
  * fewer candidate files than the table has whenever the range excludes
  * whole days).
  */
class GeneratedPruningPropertySpec extends SparkSpec {
  import spark.implicits._

  test("random predicates: results exact, derived pruning sound and effective") {
    val rnd = new scala.util.Random(0x6E17AL)
    val t = tmpDir("gp-prop").resolve("t").toString
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("p_date", DateType, nullable = true,
        metadata = new MetadataBuilder()
          .putString("delta.generationExpression", "CAST(ts AS DATE)").build())))
    DeltaWrite.createIfAbsent(spark, t, schema, partitionBy = Seq("p_date"))
    // 10 days × random seconds, plus exact-midnight rows (the boundary
    // the strict-to-non-strict widening must keep sound)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = (1 to 400).map { i =>
      val day = rnd.nextInt(10)
      val sec =
        if (i % 20 == 0) 0L // exact midnight
        else rnd.nextLong(24L * 3600)
      (i.toLong, new java.sql.Timestamp(base + day * 86400000L + sec * 1000L))
    }
    DeltaWrite.append(spark, t, rows.toDF("id", "ts").repartition(3))

    val raw = rows.toDF("id", "ts")
    val snap = DeltaLog.snapshot(spark, t)
    val totalFiles = snap.files.size

    def randInstant(): String = {
      val day = rnd.nextInt(11)
      val sec = if (rnd.nextBoolean()) 0L else rnd.nextLong(24L * 3600)
      new java.sql.Timestamp(base + day * 86400000L + sec * 1000L).toString
    }
    def cmp(): String = {
      val op = Seq(">=", ">", "<", "<=", "=")(rnd.nextInt(5))
      s"ts $op '${randInstant()}'"
    }

    var prunedAtLeastOnce = false
    (1 to 40).foreach { trial =>
      val predicate = rnd.nextInt(4) match {
        case 0 => cmp()
        case 1 => s"${cmp()} AND ${cmp()}"
        case 2 => s"(${cmp()}) OR (${cmp()})"
        case 3 => s"ts IN ('${randInstant()}', '${randInstant()}', '${randInstant()}')"
      }
      val got = DeltaLog.readWhere(spark, t, predicate)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = raw.filter(predicate).select("id").collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"trial=$trial [$predicate]: missing=${(want -- got).take(5)} " +
          s"extra=${(got -- want).take(5)}")
      val expr = GeneratedPruning.augment(spark, snap,
        spark.sessionState.sqlParser.parseExpression(predicate))
      val cand = snap.files.count(f => DeltaStats.mayMatch(snap, f, expr))
      if (cand < totalFiles) prunedAtLeastOnce = true
    }
    assert(prunedAtLeastOnce,
      "40 random range predicates over 10 day-partitions never pruned a file")
  }

  test("random predicates over a PERIODIC month(ts) partition: exact, sound, effective") {
    val rnd = new scala.util.Random(0xBEEF15L)
    val t = tmpDir("gp-prop-month").resolve("t").toString
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("p_m", IntegerType, nullable = true,
        metadata = new MetadataBuilder()
          .putString("delta.generationExpression", "month(ts)").build())))
    DeltaWrite.createIfAbsent(spark, t, schema, partitionBy = Seq("p_m"))
    // two YEARS of data so cross-year ranges exist (where month() pruning
    // must refuse) alongside same-year ranges (where it must bite)
    val base = java.sql.Timestamp.valueOf("2023-01-01 00:00:00").getTime
    val rows = (1 to 500).map { i =>
      val day = rnd.nextInt(730)
      val sec = if (i % 25 == 0) 0L else rnd.nextLong(24L * 3600)
      (i.toLong, new java.sql.Timestamp(base + day * 86400000L + sec * 1000L))
    }
    DeltaWrite.append(spark, t, rows.toDF("id", "ts").repartition(3))
    val raw = rows.toDF("id", "ts")
    val snap = DeltaLog.snapshot(spark, t)
    val totalFiles = snap.files.size

    def randInstant(sameYear: Boolean): String = {
      val day = if (sameYear) rnd.nextInt(365) else rnd.nextInt(730)
      val sec = if (rnd.nextBoolean()) 0L else rnd.nextLong(24L * 3600)
      new java.sql.Timestamp(base + day * 86400000L + sec * 1000L).toString
    }
    var prunedAtLeastOnce = false
    (1 to 40).foreach { trial =>
      val sameYear = rnd.nextBoolean()
      val (a, b) = (randInstant(sameYear), randInstant(sameYear))
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val predicate = rnd.nextInt(3) match {
        case 0 => s"ts >= '$lo' AND ts < '$hi'"
        case 1 => s"ts > '$lo' AND ts <= '$hi'"
        case 2 => s"ts = '$lo'"
      }
      val got = DeltaLog.readWhere(spark, t, predicate)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = raw.filter(predicate).select("id").collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"trial=$trial [$predicate]: missing=${(want -- got).take(5)} " +
          s"extra=${(got -- want).take(5)}")
      val expr = GeneratedPruning.augment(spark, snap,
        spark.sessionState.sqlParser.parseExpression(predicate))
      val cand = snap.files.count(f => DeltaStats.mayMatch(snap, f, expr))
      if (cand < totalFiles) prunedAtLeastOnce = true
    }
    assert(prunedAtLeastOnce,
      "40 random predicates over month partitions never pruned a file")
  }
}
