package graft.destinations

import graft.SparkSpec
import graft.sources.DeltaLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delta type widening: re-type the COLUMN, never rewrite the files. The
  * first test pins the capability everything rests on — Spark 4's parquet
  * scan up-casting narrow physical types to the wider requested schema —
  * because [[TypeWidening.allowed]] must offer exactly the promotions the
  * scan path honors (an entry the scan can't honor corrupts reads; an
  * entry it could honor but we refuse is lost capability, but safe).
  */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  test("spark parquet scan up-casts every promotion in the allowed matrix") {
    val dir = tmpDir("tw-upcast")
    Seq((1.toByte, 2.toShort, 3, 4.5f)).toDF("b", "s", "i", "f")
      .write.mode("overwrite").parquet(dir.resolve("p").toString)
    val wide = StructType(Seq(
      StructField("b", LongType), StructField("s", IntegerType),
      StructField("i", DoubleType), StructField("f", DoubleType)))
    val r = spark.read.schema(wide).parquet(dir.resolve("p").toString).head()
    assert(r.getLong(0) == 1L && r.getInt(1) == 2 &&
      r.getDouble(2) == 3.0 && r.getDouble(3) == 4.5)
  }

  test("mergeSchema append widens int→long / float→double; old files up-cast; history recorded") {
    val dir = tmpDir("tw-widen")
    val table = dir.resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", IntegerType), StructField("v", FloatType))),
      properties = Map("delta.enableTypeWidening" -> "true"))
    // enablement names the feature up front, BOTH lists (old files carry
    // the narrow type, so a reader that doesn't understand widening must
    // refuse before it misreads)
    val p0 = DeltaLog.snapshot(spark, table).protocol.get
    assert(p0.minReaderVersion == 3 && p0.minWriterVersion == 7)
    assert(p0.readerFeatures.contains("typeWidening") &&
      p0.writerFeatures.contains("typeWidening"))

    DeltaWrite.append(spark, table,
      Seq((1, 1.5f), (2, 2.5f)).toDF("k", "v"))                       // v1: narrow
    val filesBefore = DeltaLog.snapshot(spark, table).files.map(_.path).toSet
    DeltaWrite.append(spark, table,
      Seq((3000000000L, 3.5), (3000000001L, 4.5)).toDF("k", "v"),
      mergeSchema = true)                                             // v2: widens
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.schema("k").dataType == LongType)
    assert(snap.schema("v").dataType == DoubleType)
    // no rewrite: v1's files are still live
    assert(filesBefore.subsetOf(snap.files.map(_.path).toSet))
    // delta.typeChanges history: from/to per field (the STABLE feature's
    // entry shape — no preview-only tableVersion field)
    def hist(f: String) = snap.schema(f).metadata
      .getMetadataArray("delta.typeChanges").toSeq
    val kh = hist("k"); val vh = hist("v")
    assert(kh.size == 1 && kh.head.getString("fromType") == "integer" &&
      kh.head.getString("toType") == "long" && !kh.head.contains("tableVersion"))
    assert(vh.size == 1 && vh.head.getString("fromType") == "float" &&
      vh.head.getString("toType") == "double")

    val rows = DeltaLog.read(spark, table).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 1.5), (2L, 2.5),
      (3000000000L, 3.5), (3000000001L, 4.5)))

    // stats pruning still works across the narrow/wide file mix
    val pruned = DeltaLog.readWhere(spark, table, "k > 2000000000")
    assert(pruned.count() == 2)

    // a rewrite after widening carries the wide type (and the narrow
    // file's rows) forward
    DeltaWrite.append(spark, table, Seq((5L, 5.5)).toDF("k", "v"))
    DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)
    assert(DeltaLog.read(spark, table).count() == 5)
  }

  test("chained widenings accumulate history: byte→integer→long, two entries in order") {
    val dir = tmpDir("tw-chain")
    val table = dir.resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", ByteType))),
      properties = Map("delta.enableTypeWidening" -> "true"))
    DeltaWrite.append(spark, table,
      Seq(1.toByte, 2.toByte).toDF("k"))                              // v1: byte
    DeltaWrite.append(spark, table,
      Seq(70000).toDF("k"), mergeSchema = true)                      // v2: →int
    DeltaWrite.append(spark, table,
      Seq(9000000000L).toDF("k"), mergeSchema = true)                // v3: →long
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.schema("k").dataType == LongType)
    val hist = snap.schema("k").metadata
      .getMetadataArray("delta.typeChanges").toSeq
    assert(hist.map(h => (h.getString("fromType"), h.getString("toType"))) ==
      Seq(("byte", "integer"), ("integer", "long")), hist.toString)
    // all three physical layouts (int8, int32, int64 parquet) read as long
    assert(DeltaLog.read(spark, table).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 70000L, 9000000000L))
    // and the narrow-file stats still prune against long predicates
    assert(DeltaLog.readWhere(spark, table, "k > 100000").count() == 1)
  }

  test("without delta.enableTypeWidening a wider batch down-casts (old behavior)") {
    val dir = tmpDir("tw-off")
    val table = dir.resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))))
    DeltaWrite.append(spark, table,
      Seq((7L, "seven")).toDF("k", "v"), mergeSchema = true)
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.schema("k").dataType == IntegerType, "must not widen when disabled")
    assert(DeltaLog.read(spark, table).head().getInt(0) == 7)
  }

  test("setProperties enables widening mid-life: reader+writer features join the protocol") {
    val dir = tmpDir("tw-midlife")
    val table = dir.resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", IntegerType))))
    DeltaWrite.append(spark, table, Seq(1, 2).toDF("k"))
    assert(DeltaLog.snapshot(spark, table).protocol
      .forall(_.minReaderVersion < 3))
    DeltaWrite.setProperties(spark, table,
      Map("delta.enableTypeWidening" -> "true"))
    val p = DeltaLog.snapshot(spark, table).protocol.get
    assert(p.minReaderVersion == 3 && p.readerFeatures.contains("typeWidening"))
    assert(p.minWriterVersion == 7 && p.writerFeatures.contains("typeWidening"))
    DeltaWrite.append(spark, table, Seq(9000000000L).toDF("k"), mergeSchema = true)
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.schema("k").dataType == LongType)
    assert(DeltaLog.read(spark, table).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 9000000000L))
  }

  test("disallowed promotions never widen: long batch into int column without the chain") {
    val dir = tmpDir("tw-disallowed")
    val table = dir.resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      properties = Map("delta.enableTypeWidening" -> "true"))
    // narrowing / lateral moves are not in the matrix: string stays string,
    // long stays long even when the batch sends int (narrower is CAST up
    // by castToSchema, not a schema change)
    DeltaWrite.append(spark, table,
      Seq((1, "x")).toDF("k", "v"), mergeSchema = true)
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.schema("k").dataType == LongType)
    assert(snap.schema("v").dataType == StringType)
    assert(!snap.schema("k").metadata.contains("delta.typeChanges"))
  }
}
