package graft.sources

import graft.SparkSpec
import graft.destinations.IcebergV3Fixture
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

/** Format-version 3 foreign tables ([[IcebergRead]]): puffin deletion
  * vectors (Delta-framed roaring64 blobs addressed by manifest offsets),
  * `initial-default` columns materialized only for files that predate the
  * field, v3 metadata tolerance (next-row-id / first-row-id), and loud
  * integrity failures (CRC) — over the hand-built spec-conformant
  * [[IcebergV3Fixture]].
  */
class IcebergV3Spec extends SparkSpec {

  test("v3: deletion vector applies; initial-default fills pre-addition files") {
    val dir = tmpDir("icev3-dv").toString
    import spark.implicits._
    val df = (0 until 10).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir, df,
      deletedPositions = Seq(1L, 3L, 5L),
      extraColumn = Some(("src", "string", "\"legacy\"")))

    val cur = IcebergRead.read(spark, dir)
    assert(cur.schema.fieldNames.toSeq == Seq("id", "name", "src"))
    val rows = cur.orderBy("id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 2, 4, 6, 7, 8, 9))
    // the file predates `src`: every row reads the declared default
    assert(rows.forall(_.getString(2) == "legacy"))
    // stored column unaffected
    assert(rows.head.getString(1) == "n0")

    // snapshot 1 (before the DV): all ten rows, default still applies
    val snap1 = IcebergRead.read(spark, dir,
      IcebergRead.Options(snapshotId = Some(1L))).orderBy("id").collect()
    assert(snap1.length == 10)
    assert(snap1.forall(_.getString(2) == "legacy"))
  }

  test("v3: DV join path (forced) equals the broadcast-filter path") {
    val dir = tmpDir("icev3-dv-join").toString
    import spark.implicits._
    val df = (0 until 12).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir, df, deletedPositions = Seq(0L, 4L, 11L))
    val expected = Seq(1, 2, 3, 5, 6, 7, 8, 9, 10)
    assert(IcebergRead.read(spark, dir).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == expected)
    // force the executor-decode anti-join shape (big-DV fallback)
    spark.conf.set("graft.iceberg.dvBroadcastBytes", "0")
    try assert(IcebergRead.read(spark, dir).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == expected)
    finally spark.conf.unset("graft.iceberg.dvBroadcastBytes")
  }

  test("v3: corrupted DV blob fails loudly (CRC)") {
    val dir = tmpDir("icev3-crc").toString
    import spark.implicits._
    val df = (0 until 5).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir, df, deletedPositions = Seq(0L))
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val dv = new Path(fs.makeQualified(new Path(dir)), "data/dv-00000.puffin")
    val bytes = {
      val in = fs.open(dv)
      val len = fs.getFileStatus(dv).getLen.toInt
      val b = new Array[Byte](len)
      try in.readFully(b) finally in.close()
      b
    }
    bytes(9) = (bytes(9) ^ 0x7f).toByte // inside the bitmap payload
    val out = fs.create(dv, true)
    try out.write(bytes) finally out.close()
    val e = intercept[Exception] { IcebergRead.read(spark, dir).count() }
    assert(e.getMessage != null)
  }

  test("v3: variant column reads natively; write-side append refuses") {
    val dir = tmpDir("icev3-variant").toString
    import spark.implicits._
    val df = spark.sql(
      """SELECT id, parse_json(concat('{"k":', id * 7, '}')) AS pv
        |FROM range(5)""".stripMargin).coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir, df, deletedPositions = Seq(2L))
    val out = IcebergRead.read(spark, dir)
      .selectExpr("id", "variant_get(pv, '$.k', 'long') AS k")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 7L), (3L, 21L), (4L, 28L)))
    // v3 appends are supported since r18, but a variant COLUMN still
    // refuses at the divergent-type guard (this writer cannot produce
    // the Variant physical form)
    val e = intercept[IllegalArgumentException] {
      graft.destinations.IcebergWrite.append(spark, dir,
        Seq((9L, "x")).toDF("id", "pv"))
    }
    assert(e.getMessage.contains("foreign-only"))
  }

  test("v3: row lineage — ids stay stable across a deletion vector") {
    val dir = tmpDir("icev3-lineage").toString
    import spark.implicits._
    val df = (0 until 8).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir, df, deletedPositions = Seq(2L, 5L))
    val rows = IcebergRead.read(spark, dir,
      IcebergRead.Options(exposeRowLineage = true))
      .orderBy("id").collect()
    // survivors keep their ORIGINAL positional ids — the deleted 2 and 5
    // leave holes, nothing renumbers
    assert(rows.map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0, 0L, 1L), (1, 1L, 1L), (3, 3L, 1L), (4, 4L, 1L),
        (6, 6L, 1L), (7, 7L, 1L)))

    // a v2 table (no first_row_id anywhere) refuses rather than invent ids
    val dir2 = tmpDir("icev3-lineage-v2").toString
    graft.destinations.IcebergWrite.create(spark, dir2,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    graft.destinations.IcebergWrite.append(spark, dir2, (1L to 3L).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, dir2,
        IcebergRead.Options(exposeRowLineage = true)).collect()
    }
    assert(e.getMessage.contains("first_row_id"))
  }

  test("v3: default spellings cover primitives; unsupported refuses") {
    val dir = tmpDir("icev3-defaults").toString
    import spark.implicits._
    val df = (0 until 3).map(i => (i, i.toLong)).toDF("id", "v")
      .coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir, df, deletedPositions = Nil,
      extraColumn = Some(("score", "double", "2.5")))
    val rows = IcebergRead.read(spark, dir).orderBy("id").collect()
    assert(rows.forall(_.getDouble(2) == 2.5))

    val dir2 = tmpDir("icev3-defaults-bad").toString
    val df2 = (0 until 3).map(i => (i, i.toLong)).toDF("id", "v")
      .coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir2, df2, deletedPositions = Nil,
      extraColumn = Some(("blob", "binary", "\"AAAA\"")))
    val e = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, dir2).collect()
    }
    assert(e.getMessage.contains("initial-default"))
  }

  test("r18: timestamp_ns reads truncate to µs; nested/partition/write refuse") {
    val dir = tmpDir("icev3-tsns").toString
    import spark.implicits._
    // nanos with sub-µs residue (truncation, not rounding, must show) and
    // a pre-1970 value (floor semantics on negatives)
    val base = 1700000000000000000L
    val rows = Seq(
      (1, base + 1999L),        // floor → ...000001 µs
      (2, base + 2500L),        // floor → ...000002 µs (not 3)
      (3, -1999L))              // floor(-1999/1000) = -2 µs
    val df = rows.toDF("id", "ev").coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir, df, deletedPositions = Nil,
      typeOverrides = Map("ev" -> "timestamptz_ns"))
    val got = IcebergRead.read(spark, dir).orderBy("id").collect()
    assert(IcebergRead.read(spark, dir).schema("ev").dataType == TimestampType)
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    assert(got.map(r => us(r.getTimestamp(1))).toSeq ==
      Seq(base / 1000L + 1L, base / 1000L + 2L, -2L))

    // NTZ flavor maps to TimestampNTZType with the same truncation
    val dir2 = tmpDir("icev3-tsns-ntz").toString
    IcebergV3Fixture.write(spark, dir2, df, deletedPositions = Nil,
      typeOverrides = Map("ev" -> "timestamp_ns"))
    val ntz = IcebergRead.read(spark, dir2)
    assert(ntz.schema("ev").dataType == TimestampNTZType)
    assert(ntz.orderBy("id").collect().map(r =>
      r.getAs[java.time.LocalDateTime](1)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        r.getAs[java.time.LocalDateTime](1).getNano / 1000L).toSeq ==
      Seq(base / 1000L + 1L, base / 1000L + 2L, -2L))

    // writes refuse (the v2 writer cannot produce NANOS physical forms)
    val e = intercept[IllegalArgumentException] {
      graft.destinations.IcebergWrite.append(spark, dir, df)
    }
    assert(e.getMessage.contains("format-version") ||
      e.getMessage.contains("foreign-only"))

    // nested ns refuses loudly at schema parse
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      """{"type":"struct","fields":[
        |  {"id":1,"name":"s","required":false,"type":{"type":"struct","fields":[
        |    {"id":2,"name":"ts","required":false,"type":"timestamp_ns"}]}}]}"""
        .stripMargin)
    val e2 = intercept[IllegalArgumentException] {
      IcebergRead.parseType(node)
    }
    assert(e2.getMessage.contains("top-level"))
  }

  test("r18: v3 deleteWhere writes puffin DVs; repeat deletes consolidate") {
    val dir = tmpDir("icev3-dv-write").toString
    import spark.implicits._
    val df = (0 until 10).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1).orderBy("id")
    IcebergV3Fixture.write(spark, dir, df, deletedPositions = Nil)

    // first DV delete: two rows positionally dead
    val s2 = graft.destinations.IcebergWrite.deleteWhere(
      spark, dir, Seq(2, 5).toDF("id"))
    assert(IcebergRead.read(spark, dir).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == Seq(0, 1, 3, 4, 6, 7, 8, 9))

    // second delete on the SAME file: consolidates — 2 and 5 must stay
    // dead (the new DV is old ∪ new, not a replacement of positions)
    graft.destinations.IcebergWrite.deleteWhere(spark, dir, Seq(7).toDF("id"))
    assert(IcebergRead.read(spark, dir).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == Seq(0, 1, 3, 4, 6, 8, 9))

    // one-live-DV-per-file invariant: exactly one live PUFFIN entry
    val conf = spark.sessionState.newHadoopConf()
    val mans = IcebergRead.manifests(spark, dir).collect()
    val liveDvEntries = mans.flatMap { m =>
      IcebergRead.avroRecords(conf,
        new Path(m.getAs[String]("path"))).filter { e =>
        val d = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        e.get("status").asInstanceOf[Int] != 2 &&
          d.get("file_format").toString.equalsIgnoreCase("PUFFIN")
      }
    }
    assert(liveDvEntries.length == 1, s"got ${liveDvEntries.length} live DVs")
    // the superseded first DV re-emits as DELETED under the new snapshot
    val deadDvEntries = mans.flatMap { m =>
      IcebergRead.avroRecords(conf,
        new Path(m.getAs[String]("path"))).filter { e =>
        val d = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        e.get("status").asInstanceOf[Int] == 2 &&
          d.get("file_format").toString.equalsIgnoreCase("PUFFIN")
      }
    }
    assert(deadDvEntries.nonEmpty)

    // snapshot summaries carry the DV accounting
    val snaps = IcebergRead.snapshots(spark, dir).collect()
      .sortBy(_.getAs[Long]("sequence_number"))
    val sum2 = snaps(1).getAs[Map[String, String]]("summary")
    assert(sum2("added-dvs") == "1")
    assert(sum2("added-position-deletes") == "2")
    val sum3 = snaps(2).getAs[Map[String, String]]("summary")
    assert(sum3("added-dvs") == "1")
    assert(sum3("removed-dvs") == "1")
    assert(sum3("added-position-deletes") == "1")

    // time travel: snapshot 1 sees everything, s2 sees the first delete
    assert(IcebergRead.read(spark, dir,
      IcebergRead.Options(snapshotId = Some(1L))).count() == 10L)
    assert(IcebergRead.read(spark, dir,
      IcebergRead.Options(snapshotId = Some(s2))).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == Seq(0, 1, 3, 4, 6, 7, 8, 9))

    // deleting nothing commits nothing
    val cur = IcebergRead.snapshots(spark, dir).count()
    graft.destinations.IcebergWrite.deleteWhere(spark, dir, Seq(99).toDF("id"))
    assert(IcebergRead.snapshots(spark, dir).count() == cur)
  }

  test("r18: native v3 lifecycle — appends assign row ids, rewrite preserves them") {
    import graft.destinations.IcebergWrite
    val dir = tmpDir("icev3-native").resolve("t").toString
    import spark.implicits._
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    IcebergWrite.create(spark, dir, sch, formatVersion = 3)
    IcebergWrite.append(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
        .coalesce(1).orderBy("id"))
    IcebergWrite.append(spark, dir,
      Seq((5L, "e"), (6L, "f")).toDF("id", "v").coalesce(1).orderBy("id"))

    def lineage(): Map[Long, (Long, Long)] =
      IcebergRead.read(spark, dir,
        IcebergRead.Options(exposeRowLineage = true))
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("_row_id"),
            r.getAs[Long]("_last_updated_sequence_number")))).toMap

    // appends claim sequential id ranges: batch 1 → 0..3 at seq 1,
    // batch 2 → 4..5 at seq 2
    assert(lineage() == Map(
      1L -> ((0L, 1L)), 2L -> ((1L, 1L)), 3L -> ((2L, 1L)), 4L -> ((3L, 1L)),
      5L -> ((4L, 2L)), 6L -> ((5L, 2L))))

    // a DV delete leaves holes, nothing renumbers
    IcebergWrite.deleteWhere(spark, dir, Seq(2L).toDF("id"))
    val afterDel = lineage()
    assert(afterDel.keySet == Set(1L, 3L, 4L, 5L, 6L))
    assert(afterDel(3L) == ((2L, 1L)) && afterDel(5L) == ((4L, 2L)))

    // compaction MATERIALIZES lineage: survivors keep their original ids
    // and last-updated sequences across the rewrite
    IcebergWrite.rewriteDataFiles(spark, dir, targetFileBytes = 1L << 30)
    assert(lineage() == afterDel)
    // rows live in ONE rewritten file now (deletes baked in)
    assert(IcebergRead.read(spark, dir).count() == 5L)

    // the id space is untouched by the rewrite: a later append continues
    // from next-row-id = 6 (at sequence 5: two appends, the DV delete,
    // the rewrite came before)
    IcebergWrite.append(spark, dir,
      Seq((7L, "g")).toDF("id", "v").coalesce(1))
    val afterApp = lineage()
    assert(afterApp(7L) == ((6L, 5L)))
    assert(afterApp(1L) == ((0L, 1L)))

    // and a DV delete STILL works on the rewritten (materialized) table
    IcebergWrite.deleteWhere(spark, dir, Seq(4L).toDF("id"))
    assert(lineage().keySet == Set(1L, 3L, 5L, 6L, 7L))
  }

  test("r18: v3 deleteWhere consolidates with a FOREIGN fixture DV") {
    val dir = tmpDir("icev3-dv-union").toString
    import spark.implicits._
    val df = (0 until 8).map(i => (i, s"n$i")).toDF("id", "name")
      .coalesce(1).orderBy("id")
    // the fixture's own snapshot-2 DV kills positions 1 and 3
    IcebergV3Fixture.write(spark, dir, df, deletedPositions = Seq(1L, 3L))
    assert(IcebergRead.read(spark, dir).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == Seq(0, 2, 4, 5, 6, 7))
    // our delete must fold the foreign DV into the consolidated one
    graft.destinations.IcebergWrite.deleteWhere(spark, dir, Seq(4).toDF("id"))
    assert(IcebergRead.read(spark, dir).orderBy("id")
      .collect().map(_.getInt(0)).toSeq == Seq(0, 2, 5, 6, 7))
    // null-safe: a null key deletes nothing here (no null ids)
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(null: Integer)), 1),
      StructType(Seq(StructField("id", IntegerType))))
    graft.destinations.IcebergWrite.deleteWhere(spark, dir, withNull)
    assert(IcebergRead.read(spark, dir).count() == 5L)
  }
}
