package graft.destinations

import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.sources.DeltaLog

/** `delta.feature.<name> = supported` protocol directives (delta-spark's
  * explicit-support mechanism), the vacuumProtocolCheck reader-writer
  * feature, and delta.appendOnly write-path enforcement. Protocol shapes
  * are pinned against the raw `_delta_log` JSON a foreign client would
  * read.
  */
class ProtocolFeaturesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def rows(from: Long, to: Long) = {
    import spark.implicits._
    (from to to).map(i => (i, s"v$i")).toDF("id", "v")
  }

  private def proto(table: String): DeltaLog.Protocol =
    DeltaLog.snapshot(spark, table).protocol.get

  test("create with delta.feature.vacuumProtocolCheck=supported: feature in BOTH lists, key not persisted") {
    val table = tmpDir("feat-vpc").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, schema,
      properties = Map("delta.feature.vacuumProtocolCheck" -> "supported"))
    val p = proto(table)
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.contains("vacuumProtocolCheck"), p.readerFeatures)
    assert(p.writerFeatures.contains("vacuumProtocolCheck"), p.writerFeatures)
    // the directive is protocol-only: never a persisted table property
    val snap = DeltaLog.snapshot(spark, table)
    assert(!snap.configuration.keys.exists(_.startsWith("delta.feature.")))
    // this writer implements the check, so its own vacuum proceeds
    DeltaWrite.append(spark, table, rows(1, 10))
    DeltaWrite.vacuum(spark, table, retainMs = 0L)
    assert(DeltaLog.read(spark, table).count() == 10L)
  }

  test("setProperties adds vacuumProtocolCheck to an existing legacy-protocol table") {
    val table = tmpDir("feat-vpc-alter").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, schema)
    DeltaWrite.append(spark, table, rows(1, 5))
    val before = proto(table)
    assert(before.minWriterVersion < 7)
    DeltaWrite.setProperties(spark, table,
      Map("delta.feature.vacuumProtocolCheck" -> "supported"))
    val p = proto(table)
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.contains("vacuumProtocolCheck"))
    assert(p.writerFeatures.contains("vacuumProtocolCheck"))
    assert(!DeltaLog.snapshot(spark, table).configuration.keys
      .exists(_.startsWith("delta.feature.")))
    // table keeps working end-to-end after the upgrade
    DeltaWrite.append(spark, table, rows(6, 10))
    assert(DeltaLog.read(spark, table).count() == 10L)
    assert(DeltaLog.verifyChecksum(spark, table, None))
  }

  test("unknown delta.feature.* is refused at create and setProperties") {
    val table = tmpDir("feat-unknown").resolve("t").toString
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.createIfAbsent(spark, table, schema,
        properties = Map("delta.feature.icebergCompatV9" -> "supported"))
    }
    assert(e.getMessage.contains("icebergCompatV9"))
    DeltaWrite.createIfAbsent(spark, table, schema)
    intercept[IllegalArgumentException] {
      DeltaWrite.setProperties(spark, table,
        Map("delta.feature.icebergCompatV9" -> "supported"))
    }
  }

  test("vacuum refuses on a foreign table whose protocol demands an unknown writer feature") {
    val table = tmpDir("feat-foreign").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, schema,
      properties = Map("delta.feature.vacuumProtocolCheck" -> "supported"))
    DeltaWrite.append(spark, table, rows(1, 10))
    // a foreign writer upgrades the protocol with a feature we don't know:
    // the vacuumProtocolCheck contract demands we stop before deleting
    val log = java.nio.file.Paths.get(table, "_delta_log")
    val v = DeltaLog.snapshot(spark, table).version + 1
    java.nio.file.Files.writeString(log.resolve(f"$v%020d.json"),
      """{"commitInfo":{"operation":"UPGRADE PROTOCOL","timestamp":1}}
        |{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["vacuumProtocolCheck"],"writerFeatures":["vacuumProtocolCheck","futureFeatureX"]}}
        |""".stripMargin)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.vacuum(spark, table, retainMs = 0L)
    }
    assert(e.getMessage.contains("futureFeatureX"))
  }

  test("appendOnly: appends and layout ops work; every data-removing op refuses") {
    import org.apache.spark.sql.functions._
    val table = tmpDir("feat-appendonly").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, schema,
      properties = Map("delta.appendOnly" -> "true"))
    DeltaWrite.append(spark, table, rows(1, 10).repartition(2))
    DeltaWrite.append(spark, table, rows(11, 20).repartition(2))
    // allowed: layout-only compaction (dataChange=false) and vacuum
    DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)
    DeltaWrite.vacuum(spark, table, retainMs = 0L)
    for ((name, op) <- Seq[(String, () => Any)](
        "delete" -> (() => DeltaWrite.delete(spark, table, "id <= 5")),
        "upsert" -> (() => DeltaWrite.upsert(spark, table,
          rows(5, 6).withColumn("v", lit("X")), Seq("id"))),
        "overwrite" -> (() => DeltaWrite.overwrite(spark, table, rows(1, 3))),
        "restore" -> (() => DeltaWrite.restore(spark, table, 1L)))) {
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("append-only"), s"$name: ${e.getMessage}")
    }
    assert(DeltaLog.read(spark, table).count() == 20L)
    // disabling the property re-opens the table for deletes
    DeltaWrite.setProperties(spark, table, Map("delta.appendOnly" -> "false"))
    DeltaWrite.delete(spark, table, "id <= 5")
    assert(DeltaLog.read(spark, table).count() == 15L)
  }

  test("delta.feature.appendOnly=supported alone does NOT enforce (support != enablement)") {
    val table = tmpDir("feat-appendonly-sup").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, schema,
      properties = Map("delta.feature.appendOnly" -> "supported"))
    val p = proto(table)
    assert(p.writerFeatures.contains("appendOnly"))
    // appendOnly is writer-only: it must NOT appear in readerFeatures
    assert(!p.readerFeatures.contains("appendOnly"))
    DeltaWrite.append(spark, table, rows(1, 10))
    DeltaWrite.delete(spark, table, "id <= 5") // allowed: config is unset
    assert(DeltaLog.read(spark, table).count() == 5L)
  }

  test("dropFeature: writer-only feature drops after its trace clears; guards refuse otherwise") {
    val table = tmpDir("feat-drop-writer").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, StructType(Seq(
      StructField("id", LongType),
      DeltaWrite.defaultField("v", StringType, "'d'"))))
    DeltaWrite.append(spark, table, { import spark.implicits._
      Seq(1L, 2L).toDF("id") })
    // trace present: refuse
    val e1 = intercept[IllegalArgumentException](
      DeltaWrite.dropFeature(spark, table, "allowColumnDefaults"))
    assert(e1.getMessage.contains("DEFAULT"))
    DeltaWrite.dropDefault(spark, table, "v")
    DeltaWrite.dropFeature(spark, table, "allowColumnDefaults")
    val p = proto(table)
    assert(!p.writerFeatures.contains("allowColumnDefaults"), p)
    // not named / not droppable both refuse
    intercept[IllegalArgumentException](
      DeltaWrite.dropFeature(spark, table, "allowColumnDefaults"))
    intercept[IllegalArgumentException](
      DeltaWrite.dropFeature(spark, table, "rowTracking"))
    // table keeps working; omitted column now null-fills
    DeltaWrite.append(spark, table, { import spark.implicits._
      Seq(3L).toDF("id") })
    val got = DeltaLog.read(spark, table).orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(got.toSeq == Seq((1L, Some("d")), (2L, Some("d")), (3L, None)))
  }

  test("dropFeature deletionVectors: TRUNCATE HISTORY — pre-drop travel gone, replay clean, reader floor back to 1") {
    val table = tmpDir("feat-drop-dv").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, schema,
      properties = Map("delta.enableDeletionVectors" -> "true"))
    DeltaWrite.append(spark, table, rows(1, 20))                       // v1
    DeltaWrite.delete(spark, table, "id % 2 = 0")                      // v2: DVs
    intercept[IllegalArgumentException](
      DeltaWrite.dropFeature(spark, table, "deletionVectors"))
    DeltaWrite.reorgPurge(spark, table)                                // v3
    intercept[IllegalArgumentException]( // property still on
      DeltaWrite.dropFeature(spark, table, "deletionVectors"))
    DeltaWrite.setProperties(spark, table, Map.empty,
      unset = Seq("delta.enableDeletionVectors"))                      // v4
    val v = DeltaWrite.dropFeature(spark, table, "deletionVectors")
    val p = proto(table)
    assert(p.minReaderVersion == 1 && p.readerFeatures.isEmpty, p)
    assert(!p.writerFeatures.contains("deletionVectors"), p)
    assert(DeltaLog.read(spark, table).collect().map(_.getLong(0)).toSet ==
      (1L to 20L).filter(_ % 2 == 1).toSet)
    assert(DeltaLog.verifyChecksum(spark, table, None))
    // pre-truncation versions no longer resolve (the history is GONE —
    // that is the drop's contract)
    intercept[Exception](
      DeltaLog.read(spark, table, versionAsOf = Some(1L)).collect())
    // post-drop lifecycle stays healthy
    DeltaWrite.append(spark, table, rows(21, 25))
    assert(DeltaLog.read(spark, table).count() == 15L)
    assert(DeltaLog.snapshot(spark, table).version == v + 1)
  }
}
