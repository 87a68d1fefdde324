package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("primitive + temporal + decimal round trip is lossless") {
    val dir = tmpDir("avro-prim")
    val df = spark.sql("""
      SELECT id,
        CAST(id AS INT) AS i32,
        CAST(id * 1.5 AS DOUBLE) AS d,
        CAST(id * 0.5 AS FLOAT) AS f,
        id % 2 = 0 AS flag,
        concat('name-', id) AS name,
        encode(concat('b', id), 'UTF-8') AS bin,
        DATE'2024-03-01' + make_interval(0, 0, 0, CAST(id AS INT)) AS dt,
        TIMESTAMP'2024-03-01 12:00:00' + make_interval(0, 0, 0, 0, 0, CAST(id AS INT), 0.123456) AS ts,
        CAST(CAST(id AS DECIMAL(12,3)) / 7 AS DECIMAL(12,3)) AS dec
      FROM range(0, 50)""")
    Avro.write(df, dir.resolve("out").toString, codec = Some("deflate"))
    val back = Avro.read(spark, dir.resolve("out").toString)
    assert(back.schema("dt").dataType == DateType)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.schema("dec").dataType == DecimalType(12, 3))
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.withColumn("bin", hex(col("bin"))).orderBy("id")
        .collect().map(_.toString).toSeq
    assert(canon(df) == canon(back))
  }

  test("nested struct / array / map round trip, incl. nulls") {
    val dir = tmpDir("avro-nested")
    val df = spark.sql("""
      SELECT id,
        named_struct('a', id, 'b', concat('x', id),
          'inner', named_struct('c', id * 2)) AS st,
        array(id, id + 1, id + 2) AS arr,
        map(concat('k', id), id, 'fixed', id * 10) AS mp,
        CASE WHEN id % 3 = 0 THEN NULL ELSE concat('v', id) END AS maybe,
        CASE WHEN id % 4 = 0 THEN NULL ELSE array(id, NULL, id + 1) END AS arr_n
      FROM range(0, 30)""")
    Avro.write(df, dir.resolve("out").toString)
    val back = Avro.read(spark, dir.resolve("out").toString)
    assert(back.schema("st").dataType.isInstanceOf[StructType])
    def canon(x: org.apache.spark.sql.DataFrame) =
      x.withColumn("mp", sort_array(map_entries(col("mp")))).orderBy("id")
        .collect().map(_.toString).toSeq
    assert(canon(df) == canon(back))
  }

  test("schema bridge rejects what Spark cannot represent") {
    val union = org.apache.avro.Schema.createUnion(
      org.apache.avro.Schema.create(org.apache.avro.Schema.Type.INT),
      org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING))
    val e = intercept[IllegalArgumentException](Avro.toSparkType(union))
    assert(e.getMessage.contains("multi-branch"))
    val e2 = intercept[IllegalArgumentException](
      Avro.toAvroSchema(CalendarIntervalType, "x", "ns"))
    assert(e2.getMessage.contains("no Avro mapping"))
  }

  test("partitioned destination escapes special chars and nulls in dir names") {
    import graft.config.{AvroDestFormat, FileDestination, Location}
    import graft.destinations.Destinations
    val dir = tmpDir("avro-part-esc")
    val df = Seq(
      ("a/b:c", 1L), ("plain", 2L), (null.asInstanceOf[String], 3L),
      ("100%", 4L)).toDF("k", "v")
    Destinations.write(spark, FileDestination("d", Location(dir.resolve("out").toString),
      AvroDestFormat(), singleFile = false, partitionColumns = Seq("k")), df)
    val dirs = new java.io.File(dir.resolve("out").toString).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("k=100%25", "k=__HIVE_DEFAULT_PARTITION__",
      "k=a%2Fb%3Ac", "k=plain"), dirs.mkString(","))
    // the escaped directory resolves and reads back the right slice
    val got = Avro.read(spark, dir.resolve("out").toString + "/k=a%2Fb%3Ac")
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("empty results still produce a readable container (single_file and directory)") {
    import graft.config.{AvroDestFormat, FileDestination, Location}
    import graft.destinations.Destinations
    val dir = tmpDir("avro-empty")
    val empty = Seq((1L, "x")).toDF("id", "s").filter(col("id") < 0)
    assert(empty.rdd.getNumPartitions >= 0) // may be zero after AQE-empty propagation
    val single = dir.resolve("one.avro").toString
    Destinations.write(spark, FileDestination("d1", Location(single),
      AvroDestFormat(), singleFile = true), empty)
    assert(new java.io.File(single).isFile)
    val backSingle = Avro.read(spark, single)
    assert(backSingle.count() == 0 && backSingle.schema.fieldNames.toSeq == Seq("id", "s"))
    val asDir = dir.resolve("dirout").toString
    Destinations.write(spark, FileDestination("d2", Location(asDir),
      AvroDestFormat(), singleFile = false), empty)
    val backDir = Avro.read(spark, asDir)
    assert(backDir.count() == 0 && backDir.schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("enum and fixed read as string and binary") {
    import org.apache.avro.{Schema, SchemaBuilder}
    val schema = SchemaBuilder.record("R").namespace("t").fields()
      .name("e").`type`(Schema.createEnum("E", null, "t", java.util.List.of("A", "B"))).noDefault()
      .name("fx").`type`(Schema.createFixed("F", null, "t", 3)).noDefault()
      .endRecord()
    assert(Avro.toSparkType(schema) == StructType(Seq(
      StructField("e", StringType, nullable = false),
      StructField("fx", BinaryType, nullable = false))))
  }
}
