package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericFixed, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro container-file read/write without the spark-avro connector.
  *
  * Spark ships `avro` + `avro-mapred` (they back shuffle-level Avro use) but
  * not the `spark-avro` DataSource, so `format("avro")` is unavailable in
  * this build. This bridge goes through the public Hadoop formats instead:
  * `AvroKeyInputFormat`/`AvroKeyOutputFormat` with driver-side schema
  * discovery and a converter tree built once per (schema, type) pair.
  *
  * The RDD hop is deliberate and contained (the "genuine per-partition
  * imperative IO" case): conversion happens element-wise inside the scan
  * task — the Avro record reader REUSES its datum, so records are converted
  * before anything could buffer them — and the result is immediately a
  * DataFrame, so every downstream operator stays declarative. Reads stay
  * distributed (one task per Avro block split); writes stay distributed
  * (one container file per partition).
  *
  * Type mapping (both directions): null/boolean/int/long/float/double/
  * string/bytes; enum→string, fixed→binary; array→array, map→map (string
  * keys), record→struct; `[null, T]` unions → nullable T; logical types
  * date (int), timestamp-millis/micros (long, session-zoned),
  * local-timestamp-millis/micros (long, NTZ), decimal (bytes/fixed).
  * Multi-branch non-null unions have no Spark analogue and are rejected
  * loudly (same policy as uint64/Decimal256 in the type system, SURVEY
  * §1.2).
  */
object Avro {

  // ------------------------------------------------------------------ read

  /** Read one `.avro` file or a directory of them (schema from the first
    * file; Avro container files carry their writer schema). */
  def read(spark: SparkSession, location: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(location)
    val fs = root.getFileSystem(conf)
    val first = firstAvroFile(fs, root).getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $location"))
    val schema = readWriterSchema(fs, first)
    val sparkType = toSparkType(schema) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"top-level Avro type must be a record, got $other")
    }
    val job = Job.getInstance(conf)
    AvroJob.setInputKeySchema(job, schema)
    val schemaJson = schema.toString
    val rdd = spark.sparkContext.newAPIHadoopFile(
        glob(fs, root).toString,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .mapPartitions { it =>
        val sch = new Schema.Parser().parse(schemaJson)
        val conv = reader(sch)
        // convert BEFORE the iterator advances: the record reader reuses
        // its datum instance between next() calls
        it.map { case (k, _) => conv(k.datum()).asInstanceOf[Row] }
      }
    spark.createDataFrame(rdd, sparkType)
  }

  private def glob(fs: FileSystem, root: Path): Path =
    if (fs.getFileStatus(root).isDirectory) new Path(root, "*.avro") else root

  private def firstAvroFile(fs: FileSystem, root: Path): Option[Path] = {
    val st = fs.getFileStatus(root)
    if (!st.isDirectory) Some(root)
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName).headOption.map(_.getPath)
  }

  private def readWriterSchema(fs: FileSystem, file: Path): Schema = {
    val in = fs.open(file)
    try {
      val stream = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try stream.getSchema finally stream.close()
    } finally in.close()
  }

  // --------------------------------------------------- schema: avro → spark

  /** Nullable-union unwrap: `[null, T]` (either order) → (T, nullable). */
  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType != Schema.Type.UNION) (s, false)
    else {
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size != 1) throw new IllegalArgumentException(
        s"multi-branch Avro union has no Spark analogue: $s")
      (nonNull.head, branches.size != nonNull.size)
    }

  private def logical(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  def toSparkType(avro: Schema): DataType = {
    val (s, _) = unwrapNullable(avro)
    s.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (logical(s) == "date") DateType else IntegerType
      case Schema.Type.LONG => logical(s) match {
        case "timestamp-millis" | "timestamp-micros" => TimestampType
        case "local-timestamp-millis" | "local-timestamp-micros" => TimestampNTZType
        case _ => LongType
      }
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        if (logical(s) == "decimal") {
          val lt = s.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
          DecimalType(lt.getPrecision, lt.getScale)
        } else BinaryType
      case Schema.Type.ARRAY =>
        val (el, elNullable) = unwrapNullable(s.getElementType)
        ArrayType(toSparkType(el), containsNull = elNullable)
      case Schema.Type.MAP =>
        val (v, vNullable) = unwrapNullable(s.getValueType)
        MapType(StringType, toSparkType(v), valueContainsNull = vNullable)
      case Schema.Type.RECORD =>
        StructType(s.getFields.asScala.toSeq.map { f =>
          val (_, nullable) = unwrapNullable(f.schema())
          StructField(f.name(), toSparkType(f.schema()), nullable = nullable)
        })
      case Schema.Type.NULL => NullType
      case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
  }

  // -------------------------------------------- converters: datum → external

  /** Converter from an Avro datum to Spark EXTERNAL types (Row /
    * java.time.* / BigDecimal — what `createDataFrame(RDD[Row], schema)`
    * expects). Built per partition from the parsed schema; closures capture
    * only other converters and primitives. */
  private def reader(avro: Schema): Any => Any = {
    val (s, _) = unwrapNullable(avro)
    val conv: Any => Any = s.getType match {
      case Schema.Type.BOOLEAN | Schema.Type.FLOAT | Schema.Type.DOUBLE =>
        identity
      case Schema.Type.INT =>
        if (logical(s) == "date")
          d => java.time.LocalDate.ofEpochDay(d.asInstanceOf[Int].toLong)
        else identity
      case Schema.Type.LONG => logical(s) match {
        case "timestamp-millis" =>
          d => java.time.Instant.ofEpochMilli(d.asInstanceOf[Long])
        case "timestamp-micros" =>
          d => microsToInstant(d.asInstanceOf[Long])
        case "local-timestamp-millis" =>
          d => java.time.LocalDateTime.ofInstant(
            java.time.Instant.ofEpochMilli(d.asInstanceOf[Long]), java.time.ZoneOffset.UTC)
        case "local-timestamp-micros" =>
          d => java.time.LocalDateTime.ofInstant(
            microsToInstant(d.asInstanceOf[Long]), java.time.ZoneOffset.UTC)
        case _ => identity
      }
      case Schema.Type.STRING | Schema.Type.ENUM => d => d.toString
      case Schema.Type.BYTES =>
        if (logical(s) == "decimal") { val sc = decScale(s); d => bytesToDecimal(bufBytes(d), sc) }
        else d => bufBytes(d)
      case Schema.Type.FIXED =>
        if (logical(s) == "decimal") { val sc = decScale(s); d => bytesToDecimal(fixedBytes(d), sc) }
        else d => fixedBytes(d)
      case Schema.Type.ARRAY =>
        val el = reader(s.getElementType)
        d => d.asInstanceOf[java.util.Collection[Any]].asScala.toSeq.map(el)
      case Schema.Type.MAP =>
        val v = reader(s.getValueType)
        d => d.asInstanceOf[java.util.Map[Any, Any]].asScala
          .map { case (k, x) => k.toString -> v(x) }.toMap
      case Schema.Type.RECORD =>
        val fields = s.getFields.asScala.toSeq.map(f => reader(f.schema())).toArray
        d => {
          val rec = d.asInstanceOf[GenericRecord]
          Row.fromSeq(fields.indices.map(i => fields(i)(rec.get(i))))
        }
      case Schema.Type.NULL => _ => null
      case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
    d => if (d == null) null else conv(d)
  }

  private def microsToInstant(us: Long): java.time.Instant = {
    val secs = Math.floorDiv(us, 1000000L)
    java.time.Instant.ofEpochSecond(secs, Math.floorMod(us, 1000000L) * 1000L)
  }
  private def bufBytes(d: Any): Array[Byte] = {
    val bb = d.asInstanceOf[java.nio.ByteBuffer].duplicate()
    val out = new Array[Byte](bb.remaining()); bb.get(out); out
  }
  private def fixedBytes(d: Any): Array[Byte] = d.asInstanceOf[GenericFixed].bytes().clone()
  private def decScale(s: Schema): Int =
    s.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
  private def bytesToDecimal(b: Array[Byte], scale: Int): java.math.BigDecimal =
    new java.math.BigDecimal(new java.math.BigInteger(b), scale)

  // ----------------------------------------------------------------- write

  /** Write `df` as Avro container files under `location` (one file per
    * partition, standard Hadoop layout). `codec`: e.g. "deflate", "snappy",
    * "null". */
  def write(df: DataFrame, location: String, codec: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val schema = toAvroSchema(df.schema, "spark_row", "graft.avro")
    val schemaJson = schema.toString
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, schema)
    codec.foreach(c => job.getConfiguration.set("avro.output.codec", c))
    df.rdd.mapPartitions { it =>
      val sch = new Schema.Parser().parse(schemaJson)
      val conv = writer(sch)
      it.map(row => (new AvroKey[GenericRecord](conv(row).asInstanceOf[GenericRecord]),
        NullWritable.get()))
    }.saveAsNewAPIHadoopFile(
      location,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Spark → Avro schema; nullable fields become `[null, T]` unions. */
  def toAvroSchema(dt: DataType, name: String, namespace: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      org.apache.avro.LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      org.apache.avro.LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      Schema.createArray(maybeNullable(toAvroSchema(et, name + "_item", namespace), containsNull))
    case MapType(StringType, vt, valueContainsNull) =>
      Schema.createMap(maybeNullable(toAvroSchema(vt, name + "_value", namespace), valueContainsNull))
    case s: StructType =>
      val fields = s.fields.map { f =>
        new Schema.Field(f.name,
          maybeNullable(toAvroSchema(f.dataType, name + "_" + f.name, namespace), f.nullable),
          null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }.toList.asJava
      Schema.createRecord(name, null, namespace, false, fields)
    case other => throw new IllegalArgumentException(
      s"no Avro mapping for Spark type ${other.catalogString}")
  }

  private def maybeNullable(s: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s

  /** Converter from Spark EXTERNAL values (Row fields as `df.rdd` yields
    * them: java.sql.Timestamp/Date, BigDecimal, Seq, Map) to Avro datums. */
  private def writer(avro: Schema): Any => Any = {
    val (s, _) = unwrapNullable(avro)
    val conv: Any => Any = s.getType match {
      case Schema.Type.BOOLEAN | Schema.Type.LONG
           if logical(s).isEmpty => identity
      case Schema.Type.INT if logical(s).isEmpty => {
        case b: Byte => b.toInt
        case sh: Short => sh.toInt
        case i => i
      }
      case Schema.Type.INT => // date
        {
          case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
          case d: java.time.LocalDate => d.toEpochDay.toInt
        }
      case Schema.Type.LONG => logical(s) match { // timestamps
        case "timestamp-micros" => {
          case t: java.sql.Timestamp =>
            // getTime already includes the milli part of nanos; add the
            // sub-millisecond micros
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          case i: java.time.Instant =>
            Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
        }
        case "local-timestamp-micros" => {
          case dt: java.time.LocalDateTime =>
            val i = dt.toInstant(java.time.ZoneOffset.UTC)
            Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
        }
        case other => throw new IllegalArgumentException(s"unexpected long logical: $other")
      }
      case Schema.Type.FLOAT | Schema.Type.DOUBLE => identity
      case Schema.Type.STRING => d => d.toString
      case Schema.Type.BYTES =>
        if (logical(s) == "decimal") {
          val sc = decScale(s)
          d => java.nio.ByteBuffer.wrap(
            d.asInstanceOf[java.math.BigDecimal].setScale(sc).unscaledValue().toByteArray)
        } else d => java.nio.ByteBuffer.wrap(d.asInstanceOf[Array[Byte]])
      case Schema.Type.ARRAY =>
        val el = writer(s.getElementType)
        // Row array fields surface as mutable.ArraySeq — match the trait
        d => d.asInstanceOf[scala.collection.Seq[Any]].map(el).toSeq.asJava
      case Schema.Type.MAP =>
        val v = writer(s.getValueType)
        d => d.asInstanceOf[scala.collection.Map[Any, Any]]
          .map { case (k, x) => k.toString -> v(x) }.toMap.asJava
      case Schema.Type.RECORD =>
        val fields = s.getFields.asScala.toSeq.map(f => writer(f.schema())).toArray
        d => {
          val row = d.asInstanceOf[Row]
          val rec = new GenericData.Record(s)
          var i = 0
          while (i < fields.length) { rec.put(i, fields(i)(row.get(i))); i += 1 }
          rec
        }
      case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
    d => if (d == null) null else conv(d)
  }
}
