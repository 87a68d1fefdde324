package graft.destinations

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.sources.DeltaLog

/** UniForm-style Iceberg metadata export ([[IcebergExport]]): the
  * filesystem-table layout, v2 metadata shape, manifest record counts, and
  * the export→read-through-Iceberg round trip that never consults
  * `_delta_log`.
  */
class IcebergExportSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("p", StringType)))

  private def rows(from: Long, to: Long, p: String) = {
    import spark.implicits._
    (from to to).map(i => (i, s"v$i", p)).toDF("id", "v", "p")
  }

  private def metaDir(t: String) = java.nio.file.Paths.get(t, "metadata")

  test("export writes the HadoopTables layout with a v2 metadata file") {
    val t = tmpDir("ice-layout").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema)
    DeltaWrite.append(spark, t, rows(1, 50, "a").repartition(2))
    assert(IcebergExport.export(spark, t) == 1)
    val md = metaDir(t)
    assert(java.nio.file.Files.readString(md.resolve("version-hint.text")).trim == "1")
    val j = mapper.readTree(java.nio.file.Files.readString(md.resolve("v1.metadata.json")))
    assert(j.get("format-version").asInt() == 2)
    assert(j.get("table-uuid").asText() ==
      DeltaLog.tableId(DeltaLog.snapshot(spark, t)).get)
    assert(j.get("schemas").get(0).get("fields").size() == 3)
    assert(j.get("snapshots").size() == 1)
    val snap = j.get("snapshots").get(0)
    assert(snap.get("summary").get("operation").asText() == "overwrite")
    assert(snap.get("summary").get("total-records").asText() == "50")
    assert(j.get("properties").has("schema.name-mapping.default"))
    // manifest list + manifest avro files exist where the metadata points
    assert(new java.io.File(new java.net.URI(
      snap.get("manifest-list").asText()).getPath.stripPrefix("file:")).exists() ||
      java.nio.file.Files.exists(java.nio.file.Paths.get(
        snap.get("manifest-list").asText().stripPrefix("file:"))))
  }

  test("read-through-Iceberg returns exactly the Delta rows (no _delta_log consulted)") {
    val t = tmpDir("ice-roundtrip").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema)
    DeltaWrite.append(spark, t, rows(1, 40, "a").repartition(2))
    DeltaWrite.append(spark, t, rows(41, 80, "b").repartition(2))
    DeltaWrite.delete(spark, t, "id % 4 = 0") // copy-on-write rewrite
    IcebergExport.export(spark, t)
    val viaIceberg = IcebergExport.readThroughIceberg(spark, t)
      .select("id", "v", "p").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val viaDelta = DeltaLog.read(spark, t)
      .select("id", "v", "p").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(viaIceberg == viaDelta)
    assert(viaIceberg.map(_._1) == (1L to 80L).filter(_ % 4 != 0).toSet)
  }

  test("partitioned table: identity spec, typed partition values, partition pruning data intact") {
    val t = tmpDir("ice-part").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema, partitionBy = Seq("p"))
    DeltaWrite.append(spark, t, rows(1, 30, "x").unionByName(rows(31, 60, "y")))
    IcebergExport.export(spark, t)
    val j = mapper.readTree(java.nio.file.Files.readString(
      metaDir(t).resolve("v1.metadata.json")))
    val spec = j.get("partition-specs").get(0).get("fields").get(0)
    assert(spec.get("name").asText() == "p")
    assert(spec.get("transform").asText() == "identity")
    assert(spec.get("field-id").asInt() == 1000)
    val back = IcebergExport.readThroughIceberg(spark, t)
      .groupBy("p").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(back == Map("x" -> 30L, "y" -> 30L))
  }

  test("re-export appends a snapshot with parent lineage and bumps the version") {
    val t = tmpDir("ice-versions").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema)
    DeltaWrite.append(spark, t, rows(1, 10, "a"))
    assert(IcebergExport.export(spark, t) == 1)
    DeltaWrite.append(spark, t, rows(11, 20, "a"))
    assert(IcebergExport.export(spark, t) == 2)
    val j = mapper.readTree(java.nio.file.Files.readString(
      metaDir(t).resolve("v2.metadata.json")))
    assert(j.get("snapshots").size() == 2)
    assert(j.get("snapshot-log").size() == 2)
    val cur = j.get("current-snapshot-id").asLong()
    val snap2 = j.get("snapshots").elements()
    val s = Iterator.continually(snap2.next()).take(2).toSeq
      .find(_.get("snapshot-id").asLong() == cur).get
    assert(s.get("parent-snapshot-id").asLong() ==
      s.get("snapshot-id").asLong() - 0 ||
      s.has("parent-snapshot-id")) // parent recorded
    assert(IcebergExport.readThroughIceberg(spark, t).count() == 20L)
  }

  test("live deletion vectors export as position-delete files: no rewrite, live rows only") {
    val t = tmpDir("ice-dv").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema,
      properties = Map("delta.enableDeletionVectors" -> "true"))
    DeltaWrite.append(spark, t, rows(1, 50, "a").repartition(1))
    val dataFilesBefore = DeltaLog.snapshot(spark, t).files.map(_.path).toSet
    DeltaWrite.delete(spark, t, "id <= 10") // merge-on-read DV
    // METADATA-ONLY: the DV-carrying table exports without any data rewrite
    IcebergExport.export(spark, t)
    assert(DeltaLog.snapshot(spark, t).files.map(_.path).toSet == dataFilesBefore,
      "export must not rewrite data files")
    assert(DeltaLog.snapshot(spark, t).files.exists(_.deletionVector.isDefined),
      "the DV must still be live (no purge happened)")
    // a position-delete parquet and a delete manifest exist in metadata/
    val metaFiles = java.nio.file.Files.list(metaDir(t)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(metaFiles.exists(f => f.startsWith("delete-") && f.endsWith(".parquet")),
      metaFiles.mkString(","))
    assert(metaFiles.exists(_.endsWith("-m1.avro")), metaFiles.mkString(","))
    // the Iceberg read path applies the position deletes: live rows only
    assert(IcebergExport.readThroughIceberg(spark, t)
      .select("id").collect().map(_.getLong(0)).toSet == (11L to 50L).toSet)
    // snapshot summary records the delete file counts
    val hint = new String(java.nio.file.Files.readAllBytes(
      metaDir(t).resolve("version-hint.text")), "UTF-8").trim
    val md = mapper.readTree(java.nio.file.Files.readAllBytes(
      metaDir(t).resolve(s"v$hint.metadata.json")))
    val cur = md.get("current-snapshot-id").asLong()
    val snap = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == cur).get
    assert(snap.get("summary").get("total-position-deletes").asText() == "10")
    // compaction (copy-on-write fold) still round-trips identically
    DeltaWrite.compact(spark, t, targetFileBytes = 1L << 30)
    IcebergExport.export(spark, t)
    assert(IcebergExport.readThroughIceberg(spark, t)
      .select("id").collect().map(_.getLong(0)).toSet == (11L to 50L).toSet)
  }

  test("icebergCompatV2: parquet files carry the mapping ids as field ids; export reuses them") {
    val t = tmpDir("ice-compat").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema, columnMapping = true,
      properties = Map("delta.enableIcebergCompatV2" -> "true"))
    val p = DeltaLog.snapshot(spark, t).protocol.get
    assert(p.writerFeatures.contains("icebergCompatV2"), p.writerFeatures)
    DeltaWrite.append(spark, t, rows(1, 20, "a").repartition(1))
    // the physical parquet schema must carry the column-mapping ids
    val snap = DeltaLog.snapshot(spark, t)
    val file = new org.apache.hadoop.fs.Path(t, snap.files.head.path)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        file, spark.sessionState.newHadoopConf()))
    val parquetFields =
      try reader.getFileMetaData.getSchema.getFields.asScala.map(f =>
        f.getName -> Option(f.getId).map(_.intValue())).toMap
      finally reader.close()
    val expectIds = snap.schema.fields.map(f =>
      snap.physicalName(f.name) ->
        Some(f.metadata.getLong("delta.columnMapping.id").toInt)).toMap
    assert(parquetFields == expectIds, s"$parquetFields vs $expectIds")
    // the exported Iceberg schema uses the SAME ids
    IcebergExport.export(spark, t)
    val j = mapper.readTree(java.nio.file.Files.readString(
      metaDir(t).resolve("v1.metadata.json")))
    val iceIds = j.get("schemas").get(0).get("fields").elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    val mappingIds = snap.schema.fields.map(f =>
      f.name -> f.metadata.getLong("delta.columnMapping.id").toInt).toMap
    assert(iceIds == mappingIds)
    assert(IcebergExport.readThroughIceberg(spark, t).count() == 20L)
    // DV + icebergCompatV2 refuse to combine, in both directions
    intercept[IllegalArgumentException] {
      DeltaWrite.setProperties(spark, t,
        Map("delta.enableDeletionVectors" -> "true"))
    }
    val t2 = tmpDir("ice-compat-dv").resolve("t").toString
    intercept[IllegalArgumentException] {
      DeltaWrite.createIfAbsent(spark, t2, schema, columnMapping = true,
        properties = Map(
          "delta.enableIcebergCompatV2" -> "true",
          "delta.enableDeletionVectors" -> "true"))
    }
  }

  test("column-mapped table: Iceberg schema speaks logical names, name mapping physical") {
    val t = tmpDir("ice-mapped").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema, columnMapping = true)
    DeltaWrite.append(spark, t, rows(1, 20, "a"))
    DeltaWrite.renameColumn(spark, t, "v", "val")
    IcebergExport.export(spark, t)
    val j = mapper.readTree(java.nio.file.Files.readString(
      metaDir(t).resolve("v1.metadata.json")))
    val names = j.get("schemas").get(0).get("fields").elements()
    val logical = Iterator.continually(names.next()).take(3).map(_.get("name").asText()).toSet
    assert(logical == Set("id", "val", "p"))
    val nm = mapper.readTree(
      j.get("properties").get("schema.name-mapping.default").asText())
    // the mapping's first names are the PHYSICAL column names in the files
    val mappedNames = nm.elements().asScala.flatMap(
      _.get("names").elements().asScala.map(_.asText())).toSet
    assert(mappedNames.exists(_.startsWith("col-")), mappedNames)
    val back = IcebergExport.readThroughIceberg(spark, t)
    assert(back.columns.toSet == Set("id", "val", "p"))
    assert(back.count() == 20L)
  }

  test("UniForm auto-sync: every commit on an enabled table refreshes the Iceberg view") {
    import graft.sources.IcebergRead
    val t = tmpDir("uniform-auto").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema,
      properties = Map("delta.universalFormat.enabledFormats" -> "iceberg"))
    // create already exported: foreign reader sees the (empty) table
    assert(IcebergRead.read(spark, t).count() == 0L)
    DeltaWrite.append(spark, t, rows(1, 10, "a"))
    assert(IcebergRead.read(spark, t).count() == 10L)
    DeltaWrite.delete(spark, t, "id % 2 = 0")
    assert(IcebergRead.read(spark, t).collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 5L, 7L, 9L))
    DeltaWrite.append(spark, t, rows(11, 12, "b"))
    assert(IcebergRead.read(spark, t).count() == 7L)
  }

  test("UniForm enablement mid-life via setProperties exports immediately; disabled tables never sync") {
    import graft.sources.IcebergRead
    val t = tmpDir("uniform-midlife").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema)
    DeltaWrite.append(spark, t, rows(1, 5, "a"))
    // not enabled: no Iceberg metadata appears
    assert(!java.nio.file.Files.exists(
      metaDir(t).resolve("version-hint.text")))
    DeltaWrite.setProperties(spark, t,
      Map("delta.universalFormat.enabledFormats" -> "iceberg"))
    assert(IcebergRead.read(spark, t).count() == 5L)
    // later commits keep the view fresh
    DeltaWrite.append(spark, t, rows(6, 8, "b"))
    assert(IcebergRead.read(spark, t).count() == 8L)
    // disabling stops the refresh (the stale view stays at 8 rows)
    DeltaWrite.setProperties(spark, t, Map.empty,
      unset = Seq("delta.universalFormat.enabledFormats"))
    DeltaWrite.append(spark, t, rows(9, 9, "b"))
    assert(IcebergRead.read(spark, t).count() == 8L)
    assert(DeltaLog.read(spark, t).count() == 9L)
  }

  // r17 (ADVICE): Delta max-side stats conventions are not verbatim-valid
  // Iceberg upper bounds — U+FFFF string tie-breakers only bound in
  // UTF-16 order, millisecond-truncated timestamps undershoot true maxima.
  test("statsBounds helpers: U+FFFF tie-breaker re-derived, coarse ts maxima padded") {
    assert(IcebergExport.upperAfterTieBreaker("abc") == Some("abd"))
    // increment never lands in the surrogate range
    assert(IcebergExport.upperAfterTieBreaker("a퟿") == Some("a"))
    assert(IcebergExport.upperAfterTieBreaker("") == None)
    val maxCp = new String(Character.toChars(0x10FFFF))
    assert(IcebergExport.upperAfterTieBreaker(maxCp) == None)
    // the derived bound exceeds any astral continuation in code-point order
    val cont = "abc" + new String(Character.toChars(0x1F600))
    assert(graft.sources.IcebergTransforms.cmp("abd", cont) > 0)

    assert(IcebergExport.tsSubPrecisionPad("2024-01-05T01:00:00.000000Z") == 0L)
    assert(IcebergExport.tsSubPrecisionPad("2024-01-05T01:00:00.000Z") == 999L)
    assert(IcebergExport.tsSubPrecisionPad("2024-01-05T01:00:00Z") == 999999L)
  }

  test("UniForm refuses VARIANT at enablement and via evolution") {
    val t = tmpDir("uniform-variant").resolve("t").toString
    val vSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", org.apache.spark.sql.types.VariantType)))
    val e1 = intercept[IllegalArgumentException] {
      DeltaWrite.createIfAbsent(spark, t, vSchema, properties = Map(
        "delta.universalFormat.enabledFormats" -> "iceberg"))
    }
    assert(e1.getMessage.contains("VARIANT"))
    DeltaWrite.createIfAbsent(spark, t, schema, properties = Map(
      "delta.universalFormat.enabledFormats" -> "iceberg",
      "delta.feature.variantType" -> "supported"))
    DeltaWrite.append(spark, t, rows(1, 3, "a"))
    import spark.implicits._
    val withVariant = Seq((4L, "v4", "a", "{\"k\":1}")).toDF("id", "v", "p", "j")
      .withColumn("payload", parse_json(col("j"))).drop("j")
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, t, withVariant, mergeSchema = true)
    }
    assert(e2.getMessage.contains("UniForm"))
  }
}
