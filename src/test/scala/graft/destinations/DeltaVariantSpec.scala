package graft.destinations

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.DeltaLog

/** Delta VARIANT columns (the stable `variantType` reader-writer feature):
  * protocol shape at create, round-trip through the writer/reader bridge,
  * stats exclusion, mergeSchema gating, and checkpoint replay.
  */
class DeltaVariantSpec extends SparkSpec {

  private def variantDf(from: Long, to: Long) = {
    import spark.implicits._
    (from to to).map(i => (i, s"""{"k":$i,"s":"v$i"}"""))
      .toDF("id", "j")
      .select(col("id"), expr("parse_json(j)").as("pv"))
  }

  private def create(name: String): String = {
    val t = tmpDir(name).resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t,
      variantDf(1, 1).schema.asInstanceOf[org.apache.spark.sql.types.StructType])
    t
  }

  test("create with a variant column: variantType in BOTH protocol lists at (3,7)") {
    val t = create("var-proto")
    val p = DeltaLog.snapshot(spark, t).protocol.get
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.contains("variantType"), p.readerFeatures)
    assert(p.writerFeatures.contains("variantType"), p.writerFeatures)
  }

  test("variant values round-trip exactly; stats skip the variant column") {
    val t = create("var-roundtrip")
    DeltaWrite.append(spark, t, variantDf(1, 50).repartition(2))
    val back = DeltaLog.read(spark, t)
      .select(col("id"), expr("variant_get(pv, '$.k', 'long')").as("k"),
        expr("variant_get(pv, '$.s', 'string')").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(back == (1L to 50L).map(i => (i, i, s"v$i")).toSet)
    // id stats prune; pv carries none (no orderable min/max for variants)
    val stats = DeltaLog.snapshot(spark, t).files.flatMap(_.stats)
    assert(stats.nonEmpty)
    stats.foreach { s =>
      assert(s.contains("\"numRecords\""), s)
      assert(s.contains("\"id\""), s)
      assert(!s.contains("\"pv\""), s)
    }
  }

  test("delete/upsert/compact on a variant table preserve values") {
    import spark.implicits._
    val t = create("var-ops")
    DeltaWrite.append(spark, t, variantDf(1, 30).repartition(2))
    DeltaWrite.delete(spark, t, "id <= 10")
    DeltaWrite.upsert(spark, t,
      Seq((20L, """{"k":2000,"s":"UP"}""")).toDF("id", "j")
        .select(col("id"), expr("parse_json(j)").as("pv")), Seq("id"))
    DeltaWrite.compact(spark, t, targetFileBytes = 1L << 30)
    val back = DeltaLog.read(spark, t)
      .select(col("id"), expr("variant_get(pv, '$.k', 'long')").as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back.keySet == (11L to 30L).toSet)
    assert(back(20L) == 2000L && back(11L) == 11L)
  }

  test("checkpoint replay keeps the variant schema and values") {
    val t = create("var-ckpt")
    DeltaWrite.append(spark, t, variantDf(1, 20).repartition(1))
    DeltaWrite.checkpoint(spark, t)
    // replay from the checkpoint alone still knows the schema is variant
    val back = DeltaLog.read(spark, t)
      .select(expr("variant_get(pv, '$.k', 'long')").as("k"))
      .collect().map(_.getLong(0)).toSet
    assert(back == (1L to 20L).toSet)
  }

  test("mergeSchema refuses a new variant column unless the protocol names the feature") {
    import spark.implicits._
    val t = tmpDir("var-merge").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    DeltaWrite.append(spark, t, Seq(1L, 2L).toDF("id"))
    val withVar = Seq((3L, """{"k":3}""")).toDF("id", "j")
      .select(col("id"), expr("parse_json(j)").as("pv"))
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.append(spark, t, withVar, mergeSchema = true)
    }
    assert(e.getMessage.contains("variantType"), e.getMessage)
    // pre-declaring support opens the path
    DeltaWrite.setProperties(spark, t, Map("delta.feature.variantType" -> "supported"))
    DeltaWrite.append(spark, t, withVar, mergeSchema = true)
    val back = DeltaLog.read(spark, t)
      .select(col("id"), expr("variant_get(pv, '$.k', 'long')").as("k"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(back == Map(1L -> -1L, 2L -> -1L, 3L -> 3L))
  }
}
