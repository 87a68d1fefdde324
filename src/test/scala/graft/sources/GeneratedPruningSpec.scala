package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.destinations.DeltaWrite

/** Generated-column partition pruning ([[GeneratedPruning]]): predicates
  * on the SOURCE column of a monotone generated partition column derive
  * partition conjuncts that prune whole partitions — and never change the
  * result.
  */
class GeneratedPruningSpec extends SparkSpec {

  private def genMeta(sql: String) =
    new MetadataBuilder().putString("delta.generationExpression", sql).build()

  private def mkDateTable(name: String): String = {
    import spark.implicits._
    val t = tmpDir(name).resolve("t").toString
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("p_date", DateType, nullable = true,
        metadata = genMeta("CAST(ts AS DATE)"))))
    DeltaWrite.createIfAbsent(spark, t, schema, partitionBy = Seq("p_date"))
    val rows = (1 to 60).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${1 + (i - 1) / 20}%02d 0${i % 9}:00:00"))
    }
    DeltaWrite.append(spark, t, rows.toDF("id", "ts"))
    t
  }

  private def prunedFiles(t: String, predicate: String): Seq[DeltaLog.AddFile] = {
    val snap = DeltaLog.snapshot(spark, t)
    val expr = GeneratedPruning.augment(spark, snap,
      spark.sessionState.sqlParser.parseExpression(predicate))
    snap.files.filter(f => DeltaStats.mayMatch(snap, f, expr))
  }

  test("ts range predicate prunes partitions through CAST(ts AS DATE)") {
    val t = mkDateTable("gp-date")
    val snap = DeltaLog.snapshot(spark, t)
    val partitions = snap.files.flatMap(_.partitionValues.values).distinct
    assert(partitions.toSet == Set("2024-01-01", "2024-01-02", "2024-01-03"))
    // day 1 prunes via the derived lower bound. The PARTITION derivation
    // alone would keep day 3 (the strict upper bound widens to
    // `p_date <= 2024-01-03`), but the r16 per-file TIMESTAMP stats are
    // exact: day 3's min ts is 00:00:00, outside `<` — pruned too.
    val kept = prunedFiles(t, "ts >= '2024-01-02 00:00:00' AND ts < '2024-01-03 00:00:00'")
    assert(kept.nonEmpty)
    assert(kept.flatMap(_.partitionValues.values).toSet ==
      Set("2024-01-02"),
      kept.flatMap(_.partitionValues.values).toSet)
    // a mid-day upper bound keeps the same boundary partition but a
    // mid-day LOWER bound on day 2 still prunes day 1 exactly
    val kept2 = prunedFiles(t, "ts >= '2024-01-02 06:00:00'")
    assert(kept2.flatMap(_.partitionValues.values).toSet ==
      Set("2024-01-02", "2024-01-03"))
    // results stay exact (the derived conjunct only removes impossible files)
    val back = DeltaLog.readWhere(spark, t,
      "ts >= '2024-01-02 00:00:00' AND ts < '2024-01-03 00:00:00'")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(back == (21L to 40L).toSet)
  }

  test("equality and In on the source column derive partition equality") {
    val t = mkDateTable("gp-eq")
    val kept = prunedFiles(t, "ts = '2024-01-03 01:00:00'")
    assert(kept.flatMap(_.partitionValues.values).toSet == Set("2024-01-03"))
    val keptIn = prunedFiles(t,
      "ts IN ('2024-01-01 01:00:00', '2024-01-03 01:00:00')")
    assert(keptIn.flatMap(_.partitionValues.values).toSet ==
      Set("2024-01-01", "2024-01-03"))
  }

  test("Or branches never derive (soundness): no partition is wrongly pruned") {
    val t = mkDateTable("gp-or")
    // a disjunction must NOT derive PARTITION conjuncts from its
    // branches; per-file COLUMN stats (r16) still evaluate Or soundly
    // branch-wise — day 2 drops because NEITHER branch can match it
    // (ts max 02T08 < 03T00 and id range [21,40] misses 1), while day 1
    // survives on the id branch and day 3 on the ts branch
    val kept = prunedFiles(t, "ts >= '2024-01-03 00:00:00' OR id = 1")
    assert(kept.flatMap(_.partitionValues.values).toSet ==
      Set("2024-01-01", "2024-01-03"))
    val back = DeltaLog.readWhere(spark, t,
      "ts >= '2024-01-03 00:00:00' OR id = 1")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(back == ((41L to 60L).toSet + 1L))
  }

  test("periodic month(ts): two-sided same-year range derives; one-sided and cross-year do not") {
    import spark.implicits._
    val t = tmpDir("gp-month").resolve("t").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("p_m", IntegerType, nullable = true,
        metadata = genMeta("month(ts)")))) // periodic: monotone within a year
    DeltaWrite.createIfAbsent(spark, t, schema, partitionBy = Seq("p_m"))
    DeltaWrite.append(spark, t, Seq("2024-02-10", "2024-06-10", "2024-11-10")
      .map(d => java.sql.Timestamp.valueOf(s"$d 00:00:00")).toDF("ts"))
    val snap = DeltaLog.snapshot(spark, t)
    def kept(pred: String): Set[String] = {
      val expr = GeneratedPruning.augment(spark, snap,
        spark.sessionState.sqlParser.parseExpression(pred))
      snap.files.filter(f => DeltaStats.mayMatch(snap, f, expr))
        .flatMap(_.partitionValues.values).toSet
    }
    // one-sided: month is not monotone over an unbounded span — no pruning
    val e0 = spark.sessionState.sqlParser.parseExpression("ts >= '2024-06-01'")
    assert(GeneratedPruning.augment(spark, snap, e0) eq e0)
    // two-sided within one year: month(ts) ∈ [5, 7] prunes Feb and Nov
    assert(kept("ts >= '2024-05-01' AND ts < '2024-07-15'") == Set("6"))
    // two-sided across a year boundary: guard fails, nothing derives
    // (Dec belongs to month 12 > Jan's 1 — a naive bound would be wrong)
    assert(kept("ts >= '2023-12-01' AND ts < '2024-03-01'") == Set("2", "6", "11"))
    // equality derives for ANY deterministic generation expression
    assert(kept("ts = '2024-11-10 00:00:00'") == Set("11"))
    // results stay exact through the derived conjuncts
    val back = DeltaLog.readWhere(spark, t,
      "ts >= '2024-05-01' AND ts < '2024-07-15'").count()
    assert(back == 1L)
  }

  test("unsound shapes derive nothing: monotone-outer over non-monotone inner, multi-source") {
    val t = tmpDir("gp-unsound").resolve("t").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      // year(non-monotone f(ts)): single source, monotone OUTER — but the
      // derived bound would be unsound; the whitelist requires the bare
      // attribute as the function argument
      StructField("p_y", IntegerType, nullable = true,
        metadata = genMeta("year(date_add(ts, month(ts)))"))))
    DeltaWrite.createIfAbsent(spark, t, schema, partitionBy = Seq("p_y"))
    val snap = DeltaLog.snapshot(spark, t)
    val e0 = spark.sessionState.sqlParser.parseExpression(
      "ts >= '2024-06-01' AND ts < '2024-07-01'")
    assert(GeneratedPruning.augment(spark, snap, e0) eq e0)
  }

  test("year() and substring prefix generations derive bounds") {
    import spark.implicits._
    val t = tmpDir("gp-year").resolve("t").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("p_y", IntegerType, nullable = true,
        metadata = genMeta("year(ts)"))))
    DeltaWrite.createIfAbsent(spark, t, schema, partitionBy = Seq("p_y"))
    DeltaWrite.append(spark, t, Seq(
      java.sql.Timestamp.valueOf("2022-06-01 00:00:00"),
      java.sql.Timestamp.valueOf("2023-06-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00")).toDF("ts"))
    val snap = DeltaLog.snapshot(spark, t)
    val expr = GeneratedPruning.augment(spark, snap,
      spark.sessionState.sqlParser.parseExpression("ts > '2023-01-15'"))
    val kept = snap.files.filter(f => DeltaStats.mayMatch(snap, f, expr))
    // year is derived non-strictly: 2023 and 2024 stay, 2022 prunes
    assert(kept.flatMap(_.partitionValues.values).toSet == Set("2023", "2024"))
  }
}
