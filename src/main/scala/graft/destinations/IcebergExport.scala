package graft.destinations

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import graft.sources.DeltaLog

import scala.jdk.CollectionConverters._

/** UniForm-style Apache Iceberg metadata export for Delta tables (public
  * Iceberg Table Spec v2, iceberg.apache.org/spec; capability class of
  * Delta UniForm: the same parquet data files served under BOTH table
  * formats — Iceberg metadata is generated alongside the Delta log, no
  * data rewrite at any table size).
  *
  * Layout is the Iceberg filesystem-table ("HadoopTables") convention an
  * Iceberg reader loads straight from the path:
  * {{{
  *   <table>/metadata/v<N>.metadata.json    table metadata (format-version 2)
  *   <table>/metadata/version-hint.text     current N
  *   <table>/metadata/snap-<id>-...avro     manifest list
  *   <table>/metadata/<uuid>-m0.avro        manifest file
  * }}}
  *
  * Each export writes ONE new snapshot describing the Delta table's
  * CURRENT live state (operation `overwrite`: every live file listed as
  * ADDED under the new snapshot — the spec shape for a replaced state),
  * appends it to the snapshot log, and bumps the metadata version.
  * `table-uuid` is the Delta table id, so re-exports stay one Iceberg
  * table.
  *
  * Since the Delta-written parquet carries no Iceberg field ids, the
  * metadata includes the spec's `schema.name-mapping.default` property
  * mapping column names → field ids — the public mechanism for exactly
  * this migrated-file case. Under column mapping mode `name` the mapping
  * speaks the files' PHYSICAL names while the Iceberg schema speaks
  * logical names, so mapped tables export cleanly too.
  *
  * Refused loudly: live deletion vectors (their masked rows need Iceberg
  * delete files; export after a copy-on-write rewrite instead) and
  * VARIANT columns (no Iceberg v2 type).
  *
  * Scale: the export is metadata-bounded — one pass over the live-file
  * manifest (the same list any read plans over), zero data-file IO; stats
  * carry the record counts.
  */
object IcebergExport {

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------ field ids

  /** Field-id assignment over the LOGICAL schema. Mapped tables REUSE the
    * Delta column-mapping ids — under icebergCompatV2 those very ids are
    * stamped into the parquet as field ids, so the exported schema, the
    * name mapping and the files all agree on one id space (ids stay
    * stable across renames too). Unmapped tables assign depth-first
    * (Iceberg's own order); either way fresh ids (list/map elements)
    * start past the highest assigned id.
    */
  private final class IdGen(startAfter: Int) {
    private var next = startAfter
    def id(f: StructField): Int =
      if (f.metadata.contains("delta.columnMapping.id"))
        f.metadata.getLong("delta.columnMapping.id").toInt
      else fresh()
    def fresh(): Int = { next += 1; next }
    def max: Int = next
  }

  private def icebergType(dt: DataType, ids: IdGen): Any =
    dt match {
      case BooleanType => "boolean"
      case ByteType | ShortType | IntegerType => "int"
      case LongType => "long"
      case FloatType => "float"
      case DoubleType => "double"
      case StringType => "string"
      case BinaryType => "binary"
      case DateType => "date"
      case _: TimestampType => "timestamptz"
      case t: TimestampNTZType => "timestamp"
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case s: StructType =>
        val o = mapper.createObjectNode()
        o.put("type", "struct")
        val fields = o.putArray("fields")
        s.fields.foreach { f =>
          val fo = fields.addObject()
          fo.put("id", ids.id(f))
          fo.put("name", f.name)
          fo.put("required", !f.nullable)
          putType(fo, "type", icebergType(f.dataType, ids))
        }
        o
      case a: ArrayType =>
        val o = mapper.createObjectNode()
        o.put("type", "list")
        o.put("element-id", ids.fresh())
        putType(o, "element", icebergType(a.elementType, ids))
        o.put("element-required", !a.containsNull)
        o
      case m: MapType =>
        val o = mapper.createObjectNode()
        o.put("type", "map")
        o.put("key-id", ids.fresh())
        putType(o, "key", icebergType(m.keyType, ids))
        o.put("value-id", ids.fresh())
        putType(o, "value", icebergType(m.valueType, ids))
        o.put("value-required", !m.valueContainsNull)
        o
      case other => throw new IllegalArgumentException(
        s"no Iceberg v2 type for ${other.catalogString}")
    }

  private def putType(o: ObjectNode, field: String, t: Any): Unit = t match {
    case s: String => o.put(field, s): Unit
    case n: ObjectNode => o.set(field, n): Unit
  }

  // --------------------------------------------------------- avro schemas

  /** `manifest_entry` Avro schema for ONE table (the data_file partition
    * struct depends on the partition columns). Field ids per the spec's
    * manifest tables. Only v2-required fields plus the ones this export
    * fills; every column is name-addressed, so optional spec fields may be
    * absent entirely.
    */
  private def manifestEntrySchema(partitionFields: Seq[(String, String, Int)]): Schema = {
    val partFields = partitionFields.map { case (name, avroType, fid) =>
      s"""{"name":${quote(name)},"type":["null",$avroType],"default":null,"field-id":$fid}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |  {"name":"content","type":"int","field-id":134},
         |  {"name":"file_path","type":"string","field-id":100},
         |  {"name":"file_format","type":"string","field-id":101},
         |  {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$partFields]}},
         |  {"name":"record_count","type":"long","field-id":103},
         |  {"name":"file_size_in_bytes","type":"long","field-id":104}
         |]}}]}""".stripMargin)
  }

  private val manifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin)

  private def quote(s: String): String = mapper.writeValueAsString(s)

  /** Avro type + value converter for a PARTITION column (Delta partition
    * values are strings in the log; Iceberg manifests carry them typed).
    */
  private def partitionAvro(dt: DataType): (String, String => AnyRef) = dt match {
    case StringType => ("\"string\"", s => s)
    case LongType => ("\"long\"", s => java.lang.Long.valueOf(s))
    case ByteType | ShortType | IntegerType => ("\"int\"", s => java.lang.Integer.valueOf(s))
    case BooleanType => ("\"boolean\"", s => java.lang.Boolean.valueOf(s))
    case DoubleType => ("\"double\"", s => java.lang.Double.valueOf(s))
    case FloatType => ("\"float\"", s => java.lang.Float.valueOf(s))
    case DateType => ("{\"type\":\"int\",\"logicalType\":\"date\"}",
      s => java.lang.Integer.valueOf(java.time.LocalDate.parse(s).toEpochDay.toInt))
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg partition type ${other.catalogString}")
  }

  // --------------------------------------------------------------- export

  /** Export/refresh Iceberg metadata for the Delta table at `tablePath`.
    * Returns the new Iceberg metadata version N (of `vN.metadata.json`).
    */
  def export(spark: SparkSession, tablePath: String): Int = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    require(!snap.files.exists(_.deletionVector.isDefined),
      s"$tablePath carries live deletion vectors; Iceberg export needs a " +
        "copy-on-write state (run DeltaWrite.reorgPurge first)")
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val qualifiedTable = fs.makeQualified(table)
    val metaDir = new Path(qualifiedTable, "metadata")
    fs.mkdirs(metaDir)

    // ---- schema + ids (logical names; physical names only in the mapping)
    val ids = new IdGen(
      snap.configuration.get("delta.columnMapping.maxColumnId")
        .map(_.toInt).getOrElse(0))
    val schemaNode = icebergType(snap.schema, ids)
      .asInstanceOf[ObjectNode]
    schemaNode.put("schema-id", 0)
    val fieldIdOf: Map[String, Int] =
      schemaNode.get("fields").elements().asScala
        .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap

    // name mapping: the files carry no Iceberg field ids, so map the names
    // they DO carry (physical under column mapping) to the schema's ids
    val nameMapping = mapper.createArrayNode()
    snap.schema.fields.foreach { f =>
      val m = nameMapping.addObject()
      val names = m.putArray("names")
      names.add(snap.physicalName(f.name))
      if (snap.physicalName(f.name) != f.name) names.add(f.name)
      m.put("field-id", fieldIdOf(f.name))
    }

    // ---- partition spec (identity transforms over the partition columns)
    val specFields = snap.partitionColumns.zipWithIndex.map { case (c, i) =>
      (c, snap.schema(c).dataType, 1000 + i)
    }
    val specNode = mapper.createObjectNode()
    specNode.put("spec-id", 0)
    val sf = specNode.putArray("fields")
    specFields.foreach { case (c, _, fid) =>
      val f = sf.addObject()
      f.put("name", c)
      f.put("transform", "identity")
      f.put("source-id", fieldIdOf(c))
      f.put("field-id", fid)
    }

    // ---- one manifest listing every live file as ADDED under this snapshot
    val snapshotId = math.abs(java.util.UUID.randomUUID().getLeastSignificantBits)
    val prior = readCurrentMetadata(fs, metaDir)
    val version = prior.map(_._1).getOrElse(0) + 1
    val sequence = version.toLong
    val nowMs = System.currentTimeMillis()

    val partAvro = specFields.map { case (c, dt, fid) =>
      val (t, conv) = partitionAvro(dt)
      (c, t, fid, conv)
    }
    val entrySchema = manifestEntrySchema(partAvro.map(p => (p._1, p._2, p._3)))
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()

    var rows = 0L
    val manifestName = s"${java.util.UUID.randomUUID()}-m0.avro"
    val manifestPath = new Path(metaDir, manifestName)
    val mw = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    mw.setMeta("format-version", "2")
    mw.setMeta("content", "data")
    mw.setMeta("schema", schemaNode.toString)
    mw.setMeta("partition-spec", specNode.get("fields").toString)
    mw.setMeta("partition-spec-id", "0")
    mw.create(entrySchema, fs.create(manifestPath, true))
    try {
      snap.files.sortBy(_.path).foreach { a =>
        val rc = a.stats.flatMap(s =>
          Option(mapper.readTree(s).get("numRecords")).map(_.asLong()))
          .getOrElse {
            // stats-less add (foreign writers often omit stats): one
            // driver-side footer read — bounded by the stats-less count,
            // and exact (the footer's record count is authoritative)
            val f = new Path(qualifiedTable, DeltaLog.decodePath(a.path))
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                f, spark.sessionState.newHadoopConf()))
            try r.getRecordCount finally r.close()
          }
        rows += rc
        val part = new GenericData.Record(partSchema)
        partAvro.foreach { case (c, _, _, conv) =>
          val raw = a.partitionValues.get(snap.physicalName(c))
            .orElse(a.partitionValues.get(c)).filter(_ != null)
          part.put(c, raw.map(conv).orNull)
        }
        val df = new GenericData.Record(dataFileSchema)
        df.put("content", 0)
        df.put("file_path",
          new Path(qualifiedTable, DeltaLog.decodePath(a.path)).toString)
        df.put("file_format", "PARQUET")
        df.put("partition", part)
        df.put("record_count", rc)
        df.put("file_size_in_bytes", a.size)
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1) // ADDED under this snapshot
        e.put("snapshot_id", snapshotId)
        e.put("sequence_number", sequence)
        e.put("file_sequence_number", sequence)
        e.put("data_file", df)
        mw.append(e)
      }
    } finally mw.close()
    val manifestLen = fs.getFileStatus(manifestPath).getLen

    // ---- manifest list
    val listName = s"snap-$snapshotId-1-${java.util.UUID.randomUUID()}.avro"
    val listPath = new Path(metaDir, listName)
    val lw = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](manifestFileSchema))
    lw.setMeta("format-version", "2")
    lw.setMeta("snapshot-id", snapshotId.toString)
    lw.setMeta("sequence-number", sequence.toString)
    lw.create(manifestFileSchema, fs.create(listPath, true))
    try {
      val m = new GenericData.Record(manifestFileSchema)
      m.put("manifest_path", manifestPath.toString)
      m.put("manifest_length", manifestLen)
      m.put("partition_spec_id", 0)
      m.put("content", 0)
      m.put("sequence_number", sequence)
      m.put("min_sequence_number", sequence)
      m.put("added_snapshot_id", snapshotId)
      m.put("added_files_count", snap.files.size)
      m.put("existing_files_count", 0)
      m.put("deleted_files_count", 0)
      m.put("added_rows_count", rows)
      m.put("existing_rows_count", 0L)
      m.put("deleted_rows_count", 0L)
      lw.append(m)
    } finally lw.close()

    // ---- table metadata
    val md = mapper.createObjectNode()
    md.put("format-version", 2)
    md.put("table-uuid", DeltaLog.tableId(snap)
      .getOrElse(java.util.UUID.randomUUID().toString))
    md.put("location", qualifiedTable.toString)
    md.put("last-sequence-number", sequence)
    md.put("last-updated-ms", nowMs)
    md.put("last-column-id", (fieldIdOf.values ++ Seq(ids.max)).max)
    md.put("current-schema-id", 0)
    md.putArray("schemas").add(schemaNode)
    md.put("default-spec-id", 0)
    md.putArray("partition-specs").add(specNode)
    md.put("last-partition-id", specFields.lastOption.map(_._3).getOrElse(999))
    md.put("default-sort-order-id", 0)
    val so = md.putArray("sort-orders").addObject()
    so.put("order-id", 0)
    so.putArray("fields")
    val props = md.putObject("properties")
    props.put("schema.name-mapping.default", nameMapping.toString)
    props.put("write.format.default", "parquet")
    md.put("current-snapshot-id", snapshotId)
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", snapshotId)
    prior.flatMap(p => Option(p._2.get("current-snapshot-id")))
      .foreach(p => snapNode.put("parent-snapshot-id", p.asLong()): Unit)
    snapNode.put("timestamp-ms", nowMs)
    snapNode.put("sequence-number", sequence)
    snapNode.put("manifest-list", listPath.toString)
    snapNode.put("schema-id", 0)
    val summary = snapNode.putObject("summary")
    summary.put("operation", "overwrite")
    summary.put("added-data-files", snap.files.size.toString)
    summary.put("added-records", rows.toString)
    summary.put("total-data-files", snap.files.size.toString)
    summary.put("total-records", rows.toString)
    val snapshots = md.putArray("snapshots")
    prior.foreach(p => Option(p._2.get("snapshots")).foreach {
      case arr: com.fasterxml.jackson.databind.node.ArrayNode =>
        arr.elements().asScala.foreach(snapshots.add)
      case _ => ()
    })
    snapshots.add(snapNode)
    val slog = md.putArray("snapshot-log")
    prior.foreach(p => Option(p._2.get("snapshot-log")).foreach {
      case arr: com.fasterxml.jackson.databind.node.ArrayNode =>
        arr.elements().asScala.foreach(slog.add)
      case _ => ()
    })
    val sl = slog.addObject()
    sl.put("timestamp-ms", nowMs)
    sl.put("snapshot-id", snapshotId)
    md.putArray("metadata-log")

    val mdPath = new Path(metaDir, s"v$version.metadata.json")
    val out = fs.create(mdPath, true)
    try out.write(md.toString.getBytes("UTF-8")) finally out.close()
    val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
    version
  }

  private def readCurrentMetadata(
      fs: org.apache.hadoop.fs.FileSystem,
      metaDir: Path): Option[(Int, ObjectNode)] = {
    val hintPath = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hintPath)) return None
    val in = fs.open(hintPath)
    val v = (try new String(in.readAllBytes(), "UTF-8") finally in.close()).trim.toInt
    val mdIn = fs.open(new Path(metaDir, s"v$v.metadata.json"))
    val node = try mapper.readTree(mdIn).asInstanceOf[ObjectNode] finally mdIn.close()
    Some((v, node))
  }

  // ------------------------------------------------------ validation read

  /** Read the table THROUGH its exported Iceberg metadata only —
    * version-hint → metadata.json → manifest list avro → manifest avro →
    * data files — deliberately never consulting `_delta_log`, so a gate
    * over this path proves an Iceberg reader would see the same rows.
    * Manifest IO is driver-side and manifest-bounded (exactly what an
    * Iceberg planner does); the data files scan distributed as usual.
    */
  def readThroughIceberg(spark: SparkSession, tablePath: String): DataFrame = {
    val table = new Path(tablePath)
    val conf = spark.sessionState.newHadoopConf()
    val fs = table.getFileSystem(conf)
    val metaDir = new Path(fs.makeQualified(table), "metadata")
    val (_, md) = readCurrentMetadata(fs, metaDir).getOrElse(
      throw new IllegalArgumentException(s"no Iceberg metadata under $tablePath"))
    val snapId = md.get("current-snapshot-id").asLong()
    val snapNode = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == snapId)
      .getOrElse(throw new IllegalStateException(s"snapshot $snapId missing"))
    val listPath = new Path(snapNode.get("manifest-list").asText())

    def avroRecords(p: Path): Seq[GenericRecord] = {
      val r = new DataFileReader[GenericRecord](
        new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toVector finally r.close()
    }

    val manifests = avroRecords(listPath)
      .map(m => new Path(m.get("manifest_path").toString))
    val files = manifests.flatMap(avroRecords).flatMap { e =>
      if (e.get("status").asInstanceOf[Int] == 2) None // DELETED
      else {
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val part = df.get("partition").asInstanceOf[GenericRecord]
        val pv = part.getSchema.getFields.asScala.map(f =>
          f.name() -> Option(part.get(f.name())).map(_.toString)).toSeq
        Some((df.get("file_path").toString, pv,
          df.get("record_count").asInstanceOf[Long]))
      }
    }

    // schema from the Iceberg metadata (id-keyed; names are logical)
    val schemaNode = md.get("schemas").elements().asScala.next()
    val fieldIds = schemaNode.get("fields").elements().asScala
      .map(_.get("id").asInt()).toArray
    val fields = schemaNode.get("fields").elements().asScala.map { f =>
      StructField(f.get("name").asText(), f.get("type").asText() match {
        case "boolean" => BooleanType
        case "int" => IntegerType
        case "long" => LongType
        case "float" => FloatType
        case "double" => DoubleType
        case "string" => StringType
        case "binary" => BinaryType
        case "date" => DateType
        case "timestamptz" => TimestampType
        case "timestamp" => TimestampNTZType
        case d if d.startsWith("decimal") =>
          val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
          DecimalType(p, s)
        case other => throw new IllegalArgumentException(
          s"readThroughIceberg does not cover type $other")
      }, nullable = !f.get("required").asBoolean())
    }.toArray
    val partCols = md.get("partition-specs").elements().asScala.next()
      .get("fields").elements().asScala.map(_.get("name").asText()).toSeq

    // `schema.name-mapping.default` (the spec's mechanism for files without
    // field ids): scan with the names the files actually carry, then
    // restore the schema's logical names — what any Iceberg reader does
    val fileNameOf: Map[Int, String] =
      Option(md.get("properties"))
        .flatMap(p => Option(p.get("schema.name-mapping.default")))
        .map(nm => mapper.readTree(nm.asText()).elements().asScala.map { m =>
          m.get("field-id").asInt() -> m.get("names").get(0).asText()
        }.toMap)
        .getOrElse(Map.empty)
    val dataIdx = fields.indices.filterNot(i => partCols.contains(fields(i).name))
    val dataSchema = StructType(dataIdx.map { i =>
      fields(i).copy(name = fileNameOf.getOrElse(fieldIds(i), fields(i).name))
    })
    val restoreNames = dataIdx.map { i =>
      col(dataSchema(dataIdx.indexOf(i)).name).as(fields(i).name)
    }

    val groups = files.groupBy(_._2).toSeq.sortBy(_._1.toString)
    val parts = groups.map { case (pv, group) =>
      val base = spark.read.schema(dataSchema).parquet(group.map(_._1): _*)
        .select(restoreNames: _*)
      pv.foldLeft(base) { case (d, (c, v)) =>
        val dt = fields.find(_.name == c).get.dataType
        // manifests store dates as epoch days (Iceberg's physical form)
        val value = (dt, v) match {
          case (DateType, Some(days)) =>
            lit(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong)))
          case (_, Some(x)) => lit(x).cast(dt)
          case (_, None) => lit(null).cast(dt)
        }
        d.withColumn(c, value)
      }
    }
    val unioned = parts.reduce(_ unionByName _)
    unioned.select(fields.map(f => col(f.name)).toIndexedSeq: _*)
  }
}
