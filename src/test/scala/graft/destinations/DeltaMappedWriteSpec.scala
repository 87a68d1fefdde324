package graft.destinations

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.sources.DeltaLog

/** Write-side column mapping (mode `name`): data files and partition dirs
  * speak physical `col-<uuid>` names, metaData carries the id/physicalName
  * metadata, and every write mode keeps working. Read-back goes through
  * [[DeltaLog]]'s mapping-aware path; raw log JSON pins what a foreign
  * reader sees.
  */
class DeltaMappedWriteSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def logLines(table: java.nio.file.Path, version: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val f = table.resolve("_delta_log").resolve(f"$version%020d.json")
    java.nio.file.Files.readString(f).linesIterator
      .filter(_.trim.nonEmpty).map(mapper.readTree).toSeq
  }

  private def action(nodes: Seq[com.fasterxml.jackson.databind.JsonNode], name: String) =
    nodes.flatMap(n => Option(n.get(name)).filterNot(_.isNull))

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("mapped create: physical names in metaData, protocol 2/5, physical data files") {
    import spark.implicits._
    val table = tmpDir("cm-create")
    assert(DeltaWrite.createIfAbsent(spark, table.toString, schema, columnMapping = true))

    val v0 = logLines(table, 0L)
    val proto = action(v0, "protocol").head
    assert(proto.get("minReaderVersion").asInt == 2, proto.toString)
    assert(proto.get("minWriterVersion").asInt == 5, proto.toString)
    val meta = action(v0, "metaData").head
    val cfg = meta.get("configuration")
    assert(cfg.get("delta.columnMapping.mode").asText == "name")
    assert(cfg.get("delta.columnMapping.maxColumnId").asText == "2")
    val ss = meta.get("schemaString").asText
    assert(ss.contains("delta.columnMapping.physicalName") && ss.contains("col-"), ss)

    DeltaWrite.append(spark, table.toString, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // the parquet files must NOT contain logical names
    val snap = DeltaLog.snapshot(spark, table.toString)
    val file = table.resolve(DeltaLog.decodePath(snap.files.head.path))
    val raw = spark.read.parquet(file.toString)
    assert(raw.columns.forall(_.startsWith("col-")), raw.columns.mkString(","))
    // logical read-back through the bridge
    val back = DeltaLog.read(spark, table.toString).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("mapped partitioned table: physical partition dirs + partitionValues keys") {
    import spark.implicits._
    val table = tmpDir("cm-part")
    DeltaWrite.createIfAbsent(spark, table.toString, schema,
      partitionBy = Seq("v"), columnMapping = true)
    DeltaWrite.append(spark, table.toString,
      Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "v"))
    val snap = DeltaLog.snapshot(spark, table.toString)
    val physV = snap.physicalName("v")
    assert(physV.startsWith("col-"))
    snap.files.foreach { f =>
      assert(f.path.startsWith(s"$physV="), f.path) // hive dir keyed physical
      assert(f.partitionValues.contains(physV), f.partitionValues.toString)
    }
    // stats keyed by physical name must drive pruning through readWhere
    val pruned = DeltaLog.readWhere(spark, table.toString, "v = 'x'")
    assert(pruned.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val back = DeltaLog.read(spark, table.toString).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == Seq((1L, "x"), (2L, "y"), (3L, "x")))
  }

  test("upsert, replace, delete, compact all work on a mapped table") {
    import spark.implicits._
    val table = tmpDir("cm-modes")
    DeltaWrite.createIfAbsent(spark, table.toString, schema, columnMapping = true)
    DeltaWrite.append(spark, table.toString,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2))

    DeltaWrite.upsert(spark, table.toString,
      Seq((5L, "FIVE"), (11L, "NEW")).toDF("id", "v"), keys = Seq("id"))
    DeltaWrite.replace(spark, table.toString,
      Seq((20L, "twenty")).toDF("id", "v"),
      Seq(graft.config.ReplaceCondition("id", "1")))
    DeltaWrite.delete(spark, table.toString, "id = 2")
    DeltaWrite.compact(spark, table.toString)

    val back = DeltaLog.read(spark, table.toString).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back.keySet == Set(3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 20L))
    assert(back(5L) == "FIVE" && back(11L) == "NEW" && back(20L) == "twenty")
  }

  test("mergeSchema append on a mapped table assigns fresh ids past maxColumnId") {
    import spark.implicits._
    val table = tmpDir("cm-evolve")
    DeltaWrite.createIfAbsent(spark, table.toString, schema, columnMapping = true)
    DeltaWrite.append(spark, table.toString, Seq((1L, "a")).toDF("id", "v"))
    DeltaWrite.append(spark, table.toString,
      Seq((2L, "b", 3.5)).toDF("id", "v", "score"), mergeSchema = true)

    val snap = DeltaLog.snapshot(spark, table.toString)
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "3")
    val scoreField = snap.schema("score")
    assert(scoreField.metadata.getLong("delta.columnMapping.id") == 3L)
    assert(snap.physicalName("score").startsWith("col-"))
    val back = DeltaLog.read(spark, table.toString).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
    assert(back(0).isNullAt(2) && back(1).getDouble(2) == 3.5) // old file null-fills
  }

  test("DV delete on a mapped table: complete protocol from CREATE, no upgrade at delete") {
    import spark.implicits._
    val table = tmpDir("cm-dv")
    DeltaWrite.createIfAbsent(spark, table.toString, schema,
      properties = Map("delta.enableDeletionVectors" -> "true"), columnMapping = true)
    // since the r13 feature-symmetry fix, create already emits the full
    // (3,7) protocol naming BOTH features in BOTH lists...
    val proto = action(logLines(table, 0L), "protocol").head
    assert(proto.get("minReaderVersion").asInt == 3)
    val rf = proto.get("readerFeatures").toString
    assert(rf.contains("columnMapping") && rf.contains("deletionVectors"), rf)
    val wf = proto.get("writerFeatures").toString
    assert(wf.contains("columnMapping") && wf.contains("deletionVectors"), wf)
    DeltaWrite.append(spark, table.toString,
      (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1))
    // ...so the DV delete commits with NO protocol action (nothing to raise)
    val v = DeltaWrite.delete(spark, table.toString, "id <= 5")
    assert(action(logLines(table, v), "protocol").isEmpty)
    val back = DeltaLog.read(spark, table.toString).collect().map(_.getLong(0)).toSet
    assert(back == (6L to 20L).toSet)
  }

  test("schema-overwrite on a mapped table remaps and stays readable") {
    import spark.implicits._
    val table = tmpDir("cm-overwrite")
    DeltaWrite.createIfAbsent(spark, table.toString, schema, columnMapping = true)
    DeltaWrite.append(spark, table.toString, Seq((1L, "a")).toDF("id", "v"))
    DeltaWrite.overwrite(spark, table.toString,
      Seq(("x", 1.5), ("y", 2.5)).toDF("name", "score"), newSchema = true)
    val snap = DeltaLog.snapshot(spark, table.toString)
    assert(snap.schema.fieldNames.toSeq == Seq("name", "score"))
    assert(snap.schema.fields.forall(_.metadata.contains("delta.columnMapping.physicalName")))
    assert(snap.configuration("delta.columnMapping.maxColumnId").toLong > 2L)
    val back = DeltaLog.read(spark, table.toString).orderBy("name").collect()
    assert(back.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("x", 1.5), ("y", 2.5)))
  }

  test("mode 'id' tables refuse writes with a clear error") {
    import spark.implicits._
    val table = tmpDir("cm-id-refuse")
    DeltaWrite.createIfAbsent(spark, table.toString, schema, columnMapping = true)
    // hand-edit the mode to 'id' (a foreign writer's table)
    val logDir = table.resolve("_delta_log")
    val v0 = logDir.resolve(f"${0L}%020d.json")
    val content = java.nio.file.Files.readString(v0)
      .replace("\"delta.columnMapping.mode\":\"name\"", "\"delta.columnMapping.mode\":\"id\"")
    java.nio.file.Files.writeString(v0, content)
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, table.toString, Seq((1L, "a")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("'id'"), e.getMessage)
  }
}
