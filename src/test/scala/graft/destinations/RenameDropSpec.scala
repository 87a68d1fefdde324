package graft.destinations

import graft.SparkSpec
import graft.sources.DeltaLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata-only RENAME/DROP COLUMN: the logical name moves, the physical
  * parquet field never does — so every pre-surgery file, its stats and its
  * partition values keep working untouched, which is the only acceptable
  * cost model for schema evolution on a 100 TB table.
  */
class RenameDropSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(prefix: String): String = {
    val table = tmpDir(prefix).resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType),
        StructField("score", DoubleType))),
      columnMapping = true)
    DeltaWrite.append(spark, table,
      Seq((1L, "one", 0.1), (2L, "two", 0.2)).toDF("id", "v", "score"))
    table
  }

  test("rename: old files read under the new name; physical name and stats survive") {
    val table = mkTable("rd-rename")
    val physBefore = DeltaLog.snapshot(spark, table).schema("v")
      .metadata.getString("delta.columnMapping.physicalName")
    val filesBefore = DeltaLog.snapshot(spark, table).files.map(_.path).toSet
    DeltaWrite.renameColumn(spark, table, "v", "label")
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "label", "score"))
    assert(snap.schema("label").metadata
      .getString("delta.columnMapping.physicalName") == physBefore,
      "rename must NOT touch the physical name")
    assert(snap.files.map(_.path).toSet == filesBefore, "rename moved data")
    // old rows under the new logical name; appends under it land fine
    DeltaWrite.append(spark, table,
      Seq((3L, "three", 0.3)).toDF("id", "label", "score"))
    val rows = DeltaLog.read(spark, table).orderBy("id")
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "one"), (2L, "two"), (3L, "three")))
    // stats skipping prunes through the rename (physical-name stats)
    def scanned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length
      }.sum
    assert(scanned(DeltaLog.readWhere(spark, table, "id >= 3")) <
      DeltaLog.snapshot(spark, table).files.size)
  }

  test("drop: the column disappears; old files keep their bytes; re-add gets a FRESH physical column") {
    val table = mkTable("rd-drop")
    val filesBefore = DeltaLog.snapshot(spark, table).files.map(_.path).toSet
    DeltaWrite.dropColumn(spark, table, "score")
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(snap.files.map(_.path).toSet == filesBefore, "drop moved data")
    assert(DeltaLog.read(spark, table).columns.toSeq == Seq("id", "v"))
    // re-adding a column with the SAME logical name maps to a NEW physical
    // name (mergeSchema assigns a fresh id) — old files' dropped values
    // must NOT resurrect under it
    DeltaWrite.append(spark, table,
      Seq((9L, "nine", 0.9)).toDF("id", "v", "score"), mergeSchema = true)
    val r = DeltaLog.read(spark, table).orderBy("id")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(2)) None else Some(x.getDouble(2))))
    assert(r.toSeq == Seq((1L, None), (2L, None), (9L, Some(0.9))))
  }

  test("guards: unmapped tables, partition/clustering columns, referenced columns, collisions") {
    // unmapped table refuses both ops
    val plain = tmpDir("rd-plain").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, plain,
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    intercept[IllegalArgumentException](
      DeltaWrite.renameColumn(spark, plain, "a", "c"))
    intercept[IllegalArgumentException](DeltaWrite.dropColumn(spark, plain, "a"))

    val table = mkTable("rd-guards")
    // collision (case-insensitive) and missing source
    intercept[IllegalArgumentException](
      DeltaWrite.renameColumn(spark, table, "v", "SCORE"))
    intercept[IllegalArgumentException](
      DeltaWrite.renameColumn(spark, table, "nope", "x"))
    intercept[IllegalArgumentException](DeltaWrite.dropColumn(spark, table, "nope"))
    // CHECK constraint reference blocks surgery on the referenced column
    DeltaWrite.setProperties(spark, table,
      Map("delta.constraints.pos" -> "score >= 0"))
    intercept[IllegalArgumentException](
      DeltaWrite.renameColumn(spark, table, "score", "s2"))
    intercept[IllegalArgumentException](DeltaWrite.dropColumn(spark, table, "score"))
    // clustering column refuses drop (spec would dangle) but renames fine?
    // no — clustering domain stores PHYSICAL names, so rename is safe and
    // drop is the only refusal. (Second small file so compact has work and
    // actually records the spec.)
    DeltaWrite.append(spark, table,
      Seq((4L, "four", 0.4)).toDF("id", "v", "score"))
    DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30,
      clusterBy = Seq("id", "v"), curve = "hilbert")
    assert(DeltaLog.clusteringColumns(DeltaLog.snapshot(spark, table)) ==
      Seq("id", "v"), "compact must have recorded the clustering spec")
    intercept[IllegalArgumentException](DeltaWrite.dropColumn(spark, table, "v"))
    DeltaWrite.renameColumn(spark, table, "v", "label")
    assert(DeltaLog.clusteringColumns(DeltaLog.snapshot(spark, table)) ==
      Seq("id", "label"), "clustering spec must follow the rename (physical names)")
    // CLUSTER BY NONE clears the spec; the formerly-blocked drop now works
    DeltaWrite.clusterByNone(spark, table)
    assert(DeltaLog.clusteringColumns(DeltaLog.snapshot(spark, table)).isEmpty)
    DeltaWrite.dropColumn(spark, table, "label")
    assert(DeltaLog.snapshot(spark, table).schema.fieldNames.toSeq ==
      Seq("id", "score"))
  }

  test("partition column renames update partitionColumns; partition drop refuses") {
    val table = tmpDir("rd-part").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("id", LongType), StructField("part", StringType))),
      partitionBy = Seq("part"), columnMapping = true)
    DeltaWrite.append(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("id", "part"))
    intercept[IllegalArgumentException](DeltaWrite.dropColumn(spark, table, "part"))
    DeltaWrite.renameColumn(spark, table, "part", "bucket")
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.partitionColumns == Seq("bucket"))
    val rows = DeltaLog.read(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b")))
    // partition pruning still keys on the unchanged physical name
    assert(DeltaLog.readWhere(spark, table, "bucket = 'a'").count() == 1)
  }
}
