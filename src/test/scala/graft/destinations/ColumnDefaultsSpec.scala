package graft.destinations

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.sources.DeltaLog

/** Column DEFAULT values — Delta writer feature `allowColumnDefaults`:
  * `CURRENT_DEFAULT` field metadata fills insert-shaped writes that omit
  * the column; explicit values always win; the protocol names the feature
  * in a v7 writer list (writer-only — the reader side never consults
  * defaults because a column can never be ADDED with one).
  */
class ColumnDefaultsSpec extends SparkSpec {

  import spark.implicits._

  private def baseSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    DeltaWrite.defaultField("status", StringType, "'pending'"),
    StructField("amount", DoubleType)))

  private def proto(table: String): DeltaLog.Protocol =
    DeltaLog.snapshot(spark, table).protocol.get

  test("create with a default: v7 writer-only feature; omitted column fills, explicit wins") {
    val table = tmpDir("dflt-create").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, baseSchema)
    val p = proto(table)
    assert(p.minWriterVersion == 7 && p.writerFeatures.contains("allowColumnDefaults"))
    assert(p.minReaderVersion == 1 && p.readerFeatures.isEmpty, p)
    // batch WITHOUT the defaulted column → fill
    DeltaWrite.append(spark, table,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    // batch WITH it → explicit value wins
    DeltaWrite.append(spark, table,
      Seq((3L, "done", 30.0)).toDF("id", "status", "amount"))
    val got = DeltaLog.read(spark, table)
      .orderBy("id").select("id", "status", "amount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "pending", 10.0), (2L, "pending", 20.0),
      (3L, "done", 30.0)))
  }

  test("non-literal defaults (expression over literals) evaluate once per insert") {
    val table = tmpDir("dflt-expr").resolve("t").toString
    val schema = StructType(Seq(
      StructField("id", LongType),
      DeltaWrite.defaultField("tag", StringType, "upper(concat('a', 'b'))"),
      DeltaWrite.defaultField("since", DateType, "CAST('2024-03-01' AS DATE)")))
    DeltaWrite.createIfAbsent(spark, table, schema)
    DeltaWrite.append(spark, table, Seq(1L).toDF("id"))
    val r = DeltaLog.read(spark, table).select("tag", "since").collect()(0)
    assert(r.getString(0) == "AB")
    assert(r.getDate(1).toString == "2024-03-01")
  }

  test("MERGE INSERT clause not naming the column takes the default; UPDATE untouched") {
    val table = tmpDir("dflt-merge").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, baseSchema)
    DeltaWrite.append(spark, table,
      Seq((1L, "old", 1.0)).toDF("id", "status", "amount"))
    val src = Seq((1L, 100.0), (2L, 200.0)).toDF("k", "amt")
    DeltaWrite.merge(spark, table, src,
      condition = "t.id = s.k",
      matched = Seq(DeltaWrite.MergeClause.Update(None, Map("amount" -> "s.amt"))),
      notMatched = Seq(DeltaWrite.MergeClause.Insert(None, Map(
        "id" -> "s.k", "amount" -> "s.amt"))))
    val got = DeltaLog.read(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // matched row keeps its explicit status; the inserted row defaults
    assert(got.toSeq == Seq((1L, "old", 100.0), (2L, "pending", 200.0)))
  }

  test("setDefault upgrades a legacy protocol (implied features carried); dropDefault reverts to null-fill") {
    val table = tmpDir("dflt-alter").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, StructType(Seq(
      StructField("id", LongType), StructField("status", StringType))))
    assert(proto(table).minWriterVersion < 7)
    DeltaWrite.append(spark, table, Seq(1L).toDF("id"))
    DeltaWrite.setDefault(spark, table, "status", "'filled'")
    val p = proto(table)
    assert(p.minWriterVersion == 7 && p.writerFeatures.contains("allowColumnDefaults"))
    // legacy-implied features survive the upgrade
    assert(p.writerFeatures.contains("appendOnly") && p.writerFeatures.contains("invariants"))
    DeltaWrite.append(spark, table, Seq(2L).toDF("id"))
    DeltaWrite.dropDefault(spark, table, "status")
    DeltaWrite.append(spark, table, Seq(3L).toDF("id"))
    val got = DeltaLog.read(spark, table).orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    // pre-default and post-drop rows are null; the mid-life row filled
    assert(got.toSeq == Seq((1L, None), (2L, Some("filled")), (3L, None)))
    // features never retract
    assert(proto(table).writerFeatures.contains("allowColumnDefaults"))
  }

  test("generated column may read a defaulted column (defaults fill first)") {
    val table = tmpDir("dflt-gen").resolve("t").toString
    val genMd = new MetadataBuilder()
      .putString("delta.generationExpression", "length(status)").build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      DeltaWrite.defaultField("status", StringType, "'pending'"),
      StructField("status_len", IntegerType, nullable = true, metadata = genMd)))
    DeltaWrite.createIfAbsent(spark, table, schema)
    DeltaWrite.append(spark, table, Seq(1L).toDF("id"))
    val r = DeltaLog.read(spark, table).select("status", "status_len").collect()(0)
    assert(r.getString(0) == "pending" && r.getInt(1) == 7)
  }

  test("guards: column-referencing default, generated/identity stacking, mergeSchema add, missing drop") {
    val table = tmpDir("dflt-guards").resolve("t").toString
    // default that reads another column is refused at create
    val bad = StructType(Seq(
      StructField("id", LongType),
      DeltaWrite.defaultField("twice", LongType, "id * 2")))
    val e1 = intercept[IllegalArgumentException] {
      DeltaWrite.createIfAbsent(spark, table, bad)
    }
    assert(e1.getMessage.contains("literal-foldable"))
    // stacking a default on a generated column is refused
    val genMd = new MetadataBuilder()
      .putString("delta.generationExpression", "id + 1")
      .putString("CURRENT_DEFAULT", "0").build()
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.createIfAbsent(spark, table, StructType(Seq(
        StructField("id", LongType),
        StructField("g", LongType, nullable = true, metadata = genMd))))
    }
    assert(e2.getMessage.contains("generated"))
    DeltaWrite.createIfAbsent(spark, table, StructType(Seq(
      StructField("id", LongType))))
    DeltaWrite.append(spark, table, Seq(1L).toDF("id"))
    // mergeSchema cannot introduce a defaulted column
    val withDflt = Seq((2L, "x")).toDF("id", "s2")
    val stamped = spark.createDataFrame(withDflt.rdd, StructType(Seq(
      StructField("id", LongType),
      DeltaWrite.defaultField("s2", StringType, "'d'"))))
    val e3 = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, table, stamped, mergeSchema = true)
    }
    assert(e3.getMessage.contains("mergeSchema"))
    // dropping a default that isn't there is loud
    val e4 = intercept[IllegalArgumentException] {
      DeltaWrite.dropDefault(spark, table, "id")
    }
    assert(e4.getMessage.contains("no DEFAULT"))
    // setDefault validates the expression too
    val e5 = intercept[IllegalArgumentException] {
      DeltaWrite.setDefault(spark, table, "id", "id + 1")
    }
    assert(e5.getMessage.contains("literal-foldable"))
  }

  test("CDF insert change rows carry the default") {
    val table = tmpDir("dflt-cdf").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, baseSchema,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, table,
      Seq((1L, "old", 1.0)).toDF("id", "status", "amount"))
    val src = Seq((5L, 500.0)).toDF("k", "amt")
    DeltaWrite.merge(spark, table, src,
      condition = "t.id = s.k",
      notMatched = Seq(DeltaWrite.MergeClause.Insert(None, Map(
        "id" -> "s.k", "amount" -> "s.amt"))))
    val cdf = DeltaLog.readCdf(spark, table, 1L, Some(2L))
      .filter(col("_change_type") === "insert")
      .select("id", "status").collect()
    assert(cdf.length == 1 && cdf(0).getString(1) == "pending")
  }
}
