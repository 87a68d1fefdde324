package graft.config

import org.apache.spark.sql.types._

/** Universal type-string syntax → Spark [[DataType]].
  *
  * Re-implements the reference's human-friendly type grammar
  * (aqueducts/schemas/src/data_types.rs:295-508: primitives + alias table,
  * nesting-aware `<...>` parameter splitting at data_types.rs:520-615) on top
  * of Spark's type system instead of Arrow's.
  *
  * Deliberate divergences (documented, not silent — SURVEY.md §1.2):
  *   - unsigned ints widen (uint8→short, uint16→int, uint32→long,
  *     uint64→decimal(20,0)) because Spark has no unsigned types;
  *   - large_* variants collapse onto their base type (size is an Arrow
  *     encoding concern, not a logical one);
  *   - fixed_list / fixed_binary lose the fixed size (not representable);
  *   - time32/time64 map to Spark 4's TimeType (second/milli widen to micros);
  *   - timestamp with any tz → session-tz TimestampType, without → NTZ; unit
  *     is always micros internally;
  *   - decimal256 with precision > 38 is rejected (Spark max precision 38).
  */
object Types {

  /** `{name, data_type, nullable=true, description}` — mirrors the reference
    * Field (data_types.rs:40-65; default-nullable at :59).
    */
  final case class FieldSpec(
      name: String,
      dataType: DataType,
      nullable: Boolean = true,
      description: Option[String] = None) {
    def toStructField: StructField = {
      val meta = description
        .map(d => new MetadataBuilder().putString("description", d).build())
        .getOrElse(Metadata.empty)
      StructField(name, dataType, nullable, meta)
    }
  }

  def toStruct(fields: Seq[FieldSpec]): StructType =
    StructType(fields.map(_.toStructField))

  def parse(s: String): DataType = {
    val t = s.trim
    simple.get(t.toLowerCase(java.util.Locale.ROOT)) match {
      case Some(dt) => dt
      case None     => parseParameterized(t)
    }
  }

  private val simple: Map[String, DataType] = Map(
    "bool" -> BooleanType, "boolean" -> BooleanType,
    "int8" -> ByteType,
    "int16" -> ShortType,
    "int32" -> IntegerType, "int" -> IntegerType, "integer" -> IntegerType,
    "int64" -> LongType, "long" -> LongType,
    // no unsigned types in Spark: widen so all values stay representable
    "uint8" -> ShortType,
    "uint16" -> IntegerType,
    "uint32" -> LongType,
    "uint64" -> DecimalType(20, 0),
    "float32" -> FloatType, "float" -> FloatType,
    "float16" -> FloatType,
    "float64" -> DoubleType, "double" -> DoubleType,
    "string" -> StringType, "utf8" -> StringType,
    "large_string" -> StringType, "large_utf8" -> StringType,
    "binary" -> BinaryType, "large_binary" -> BinaryType,
    "date32" -> DateType, "date" -> DateType,
    "date64" -> DateType)

  private def parseParameterized(s: String): DataType = {
    val open = s.indexOf('<')
    require(open > 0 && s.endsWith(">"), s"Unknown data type: $s")
    val name = s.substring(0, open).trim.toLowerCase(java.util.Locale.ROOT)
    val params = splitTopLevel(s.substring(open + 1, s.length - 1))
    name match {
      case "list" | "large_list" =>
        require(params.length == 1, s"list type requires exactly 1 parameter, got ${params.length}")
        ArrayType(parse(params.head), containsNull = true)
      case "fixed_list" =>
        require(params.length == 2, s"fixed_list type requires exactly 2 parameters, got ${params.length}")
        params(1).trim.toInt // validate the size even though Spark can't carry it
        ArrayType(parse(params.head), containsNull = true)
      case "fixed_binary" =>
        require(params.length == 1, s"fixed_binary type requires exactly 1 parameter, got ${params.length}")
        params.head.trim.toInt
        BinaryType
      case "decimal" | "decimal128" | "decimal256" =>
        require(params.length == 2, s"decimal type requires exactly 2 parameters, got ${params.length}")
        val (p, sc) = (params(0).trim.toInt, params(1).trim.toInt)
        require(p <= DecimalType.MAX_PRECISION, s"decimal precision $p exceeds Spark max ${DecimalType.MAX_PRECISION}")
        DecimalType(p, sc)
      case "timestamp" =>
        require(params.nonEmpty && params.length <= 2, s"timestamp type requires 1 or 2 parameters, got ${params.length}")
        validateTimeUnit(params.head)
        if (params.length == 2 && params(1).trim.nonEmpty) TimestampType else TimestampNTZType
      case "time32" | "time64" =>
        require(params.length == 1, s"$name type requires exactly 1 parameter, got ${params.length}")
        validateTimeUnit(params.head)
        TimeType(TimeType.DEFAULT_PRECISION)
      case "duration" =>
        require(params.length == 1, s"duration type requires exactly 1 parameter, got ${params.length}")
        validateTimeUnit(params.head)
        DayTimeIntervalType()
      case "interval" =>
        params.map(_.trim.toLowerCase(java.util.Locale.ROOT)) match {
          case Seq("year_month") => YearMonthIntervalType()
          case Seq("day_time")   => DayTimeIntervalType()
          case Seq("month_day_nano") => CalendarIntervalType
          case other => throw new IllegalArgumentException(s"Unknown interval unit: ${other.mkString(",")}")
        }
      case "struct" =>
        StructType(params.map(parseStructField))
      case "map" =>
        require(params.length == 2, s"map type requires exactly 2 parameters, got ${params.length}")
        MapType(parse(params(0)), parse(params(1)), valueContainsNull = true)
      case "dictionary" =>
        // dictionary is an encoding, not a logical type: use the value type
        require(params.length == 2, s"dictionary type requires exactly 2 parameters, got ${params.length}")
        parse(params(1))
      case other =>
        throw new IllegalArgumentException(s"Unknown parameterized type: $other")
    }
  }

  private def parseStructField(p: String): StructField = {
    val idx = topLevelColon(p)
    require(idx > 0, s"struct field must be name:type, got: $p")
    StructField(p.substring(0, idx).trim, parse(p.substring(idx + 1)), nullable = true)
  }

  private def validateTimeUnit(s: String): Unit = s.trim.toLowerCase(java.util.Locale.ROOT) match {
    case "second" | "s" | "millisecond" | "ms" | "microsecond" | "us" | "nanosecond" | "ns" => ()
    case other => throw new IllegalArgumentException(s"Unknown time unit: $other")
  }

  /** Split on commas at nesting depth 0 (`struct<a:int32,b:list<string>>`). */
  private[config] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '<' => depth += 1; cur += '<'
      case '>' => depth -= 1; cur += '>'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty || s.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def topLevelColon(s: String): Int = {
    var depth = 0
    s.zipWithIndex.foreach {
      case ('<', _) => depth += 1
      case ('>', _) => depth -= 1
      case (':', i) if depth == 0 => return i
      case _ => ()
    }
    -1
  }

  /** Render a Spark type back to the universal string syntax (round-trip for
    * the subset Spark can represent; used by tests and error messages).
    */
  def render(dt: DataType): String = dt match {
    case BooleanType => "bool"
    case ByteType => "int8"
    case ShortType => "int16"
    case IntegerType => "int32"
    case LongType => "int64"
    case FloatType => "float32"
    case DoubleType => "float64"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date32"
    case TimestampType => "timestamp<microsecond,UTC>"
    case TimestampNTZType => "timestamp<microsecond>"
    case _: TimeType => "time64<microsecond>"
    case d: DecimalType => s"decimal<${d.precision},${d.scale}>"
    case a: ArrayType => s"list<${render(a.elementType)}>"
    case m: MapType => s"map<${render(m.keyType)},${render(m.valueType)}>"
    case st: StructType =>
      st.fields.map(f => s"${f.name}:${render(f.dataType)}").mkString("struct<", ",", ">")
    case _: DayTimeIntervalType => "duration<microsecond>"
    case _: YearMonthIntervalType => "interval<year_month>"
    case CalendarIntervalType => "interval<month_day_nano>"
    case other => throw new IllegalArgumentException(s"Cannot render type: $other")
  }
}
