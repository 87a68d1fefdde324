package graft.destinations

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.sources.DeltaLog

/** STABLE row ids over the Delta row-tracking writer feature (public
  * PROTOCOL.md "Row Tracking"): every physical row carries a table-unique
  * id that SURVIVES rewrites. Fresh rows take `baseRowId + position` from
  * the add action; rewrites preserve ids via the table's materialized
  * columns; the high-water mark rides a `delta.rowTracking` domainMetadata
  * action in the same commit that consumes it. The reference delegates all
  * of this to delta-rs — here it is protocol-level, pinned against the raw
  * `_delta_log` JSON an external reader would see.
  */
class RowTrackingSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def logLines(table: String, version: Long): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val f = java.nio.file.Paths.get(table, "_delta_log", f"$version%020d.json")
    java.nio.file.Files.readString(f).linesIterator
      .filter(_.trim.nonEmpty).map(mapper.readTree).toSeq
  }

  private def hwmOf(table: String, version: Long): Option[Long] =
    logLines(table, version)
      .flatMap(n => Option(n.get("domainMetadata")))
      .find(_.get("domain").asText == "delta.rowTracking")
      .map(d => mapper.readTree(d.get("configuration").asText)
        .get("rowIdHighWaterMark").asLong)

  private def idMap(table: String): Map[Long, (Long, Long)] =
    DeltaLog.readWithRowIds(spark, table)
      .select(col("k"), col("_row_id"), col("_row_commit_version"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def create(table: String, extraProps: Map[String, String] = Map.empty): Unit =
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      properties = Map("delta.enableRowTracking" -> "true") ++ extraProps)

  test("create + append assigns fresh base row ids and commits the high-water mark atomically") {
    import spark.implicits._
    val t = tmpDir("rt-fresh").resolve("t").toString
    create(t)

    // protocol names the features; config reserves the materialized columns
    val proto = logLines(t, 0L).flatMap(n => Option(n.get("protocol"))).head
    val wf = proto.get("writerFeatures").elements()
    val feats = Iterator.continually(wf).takeWhile(_.hasNext).map(_.next().asText).toSet
    assert(feats.contains("rowTracking") && feats.contains("domainMetadata"), feats)
    val snap0 = DeltaLog.snapshot(spark, t)
    assert(snap0.configuration.contains("delta.rowTracking.materializedRowIdColumnName"))
    assert(snap0.configuration.contains("delta.rowTracking.materializedRowCommitVersionColumnName"))

    // first append: ids start at 0 (hwm was -1), mark = n-1, SAME commit
    DeltaWrite.append(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1))
    val adds1 = logLines(t, 1L).flatMap(n => Option(n.get("add")))
    assert(adds1.size == 1)
    assert(adds1.head.get("baseRowId").asLong == 0L, adds1.head.toString)
    assert(adds1.head.get("defaultRowCommitVersion").asLong == 1L)
    assert(hwmOf(t, 1L).contains(2L))

    // second append continues past the mark — never reuses an id
    DeltaWrite.append(spark, t, Seq((4L, "d"), (5L, "e")).toDF("k", "v").coalesce(1))
    assert(logLines(t, 2L).flatMap(n => Option(n.get("add")))
      .head.get("baseRowId").asLong == 3L)
    assert(hwmOf(t, 2L).contains(4L))

    // read side: _row_id is the add's baseRowId + row position, commit
    // version the add's defaultRowCommitVersion
    val ids = idMap(t)
    assert(ids.values.map(_._1).toSeq.sorted == Seq(0L, 1L, 2L, 3L, 4L), ids)
    assert(ids(1L)._2 == 1L && ids(4L)._2 == 2L, ids)
    // a multi-file append partitions the id space per file by numRecords
    DeltaWrite.append(spark, t,
      Seq((6L, "f"), (7L, "g"), (8L, "h"), (9L, "i")).toDF("k", "v").repartition(2))
    val adds3 = logLines(t, 3L).flatMap(n => Option(n.get("add")))
    val bases = adds3.map(_.get("baseRowId").asLong).sorted
    assert(bases.head == 5L && bases.distinct.size == adds3.size, bases)
    assert(idMap(t).values.map(_._1).toSeq.sorted == (0L to 8L), idMap(t))
  }

  test("compact and restore preserve stable ids through the materialized columns") {
    import spark.implicits._
    val t = tmpDir("rt-compact").resolve("t").toString
    create(t)
    (0 until 3).foreach(i => DeltaWrite.append(spark, t,
      Seq((i * 2L, s"v$i"), (i * 2L + 1L, s"w$i")).toDF("k", "v").coalesce(1)))
    val before = idMap(t)

    // OPTIMIZE rewrites every row into packed files — ids must not move
    DeltaWrite.compact(spark, t, targetFileBytes = 1024L * 1024)
    val cpVer = DeltaLog.snapshot(spark, t).version
    assert(idMap(t) == before, "compaction changed stable row ids")
    // the packed file materializes ids; its add still gets a FRESH base
    // (spec: every add on a tracked table carries one) and bumps the mark
    val addC = logLines(t, cpVer).flatMap(n => Option(n.get("add"))).head
    assert(addC.get("baseRowId").asLong == 6L, addC.toString)
    assert(hwmOf(t, cpVer).contains(11L))

    // restore re-adds the ORIGINAL files with their original baseRowIds:
    // same ids come back, mark never retreats
    DeltaWrite.restore(spark, t, cpVer - 1)
    assert(idMap(t) == before, "restore changed stable row ids")
    val hwmNow = DeltaLog.rowIdHighWaterMark(DeltaLog.snapshot(spark, t))
    assert(hwmNow >= 11L, s"high-water mark retreated to $hwmNow")
  }

  test("upsert: updated rows inherit their id, inserts get fresh ids, untouched files keep theirs") {
    import spark.implicits._
    val t = tmpDir("rt-upsert").resolve("t").toString
    create(t)
    DeltaWrite.append(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)) // ids 0,1
    DeltaWrite.append(spark, t,
      Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1)) // ids 2,3
    val before = idMap(t)

    val ver = DeltaWrite.upsert(spark, t,
      Seq((2L, "B2"), (9L, "new")).toDF("k", "v"), Seq("k"))
    val after = idMap(t)
    // k=2 was UPDATED: same logical row ⇒ same stable id, commit version
    // falls to this commit (no materialized version for the new image)
    assert(after(2L)._1 == before(2L)._1, s"update changed id: $before -> $after")
    assert(after(2L)._2 == ver, after(2L))
    // k=1 shared the rewritten file: id AND commit version both preserved
    assert(after(1L) == before(1L), s"survivor moved: $before -> $after")
    // file 2 was untouched bytes: nothing moved
    assert(after(3L) == before(3L) && after(4L) == before(4L))
    // the insert takes a fresh id past every pre-existing one
    assert(after(9L)._1 > before.values.map(_._1).max, after(9L))
    assert(after(9L)._2 == ver)
    val vRead = DeltaLog.read(spark, t).select(col("k"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(vRead == Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d", 9L -> "new"))
  }

  test("DV delete keeps survivor ids without rewriting; replace rewrites preserve them") {
    import spark.implicits._
    val t = tmpDir("rt-delete").resolve("t").toString
    create(t, Map("delta.enableDeletionVectors" -> "true"))
    DeltaWrite.append(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1))
    val before = idMap(t)
    DeltaWrite.delete(spark, t, "k = 2") // DV: same file, bitmap filter
    val after = idMap(t)
    assert(!after.contains(2L))
    assert(after == before - 2L, s"DV delete moved ids: $before -> $after")

    // replace rewrites the file (remove + add): survivors keep ids
    DeltaWrite.replace(spark, t, Seq((3L, "C3")).toDF("k", "v"),
      Seq(graft.config.ReplaceCondition("k", "3")))
    val afterR = idMap(t)
    assert(afterR(1L)._1 == before(1L)._1 && afterR(4L)._1 == before(4L)._1,
      s"replace moved survivor ids: $before -> $afterR")
  }

  test("v2 checkpoint carries the high-water mark through metadata cleanup — both manifest flavors") {
    import spark.implicits._
    for (json <- Seq(false, true)) {
      val t = tmpDir(s"rt-v2cp-$json").resolve("t").toString
      create(t, Map("delta.checkpointPolicy" -> "v2"))
      DeltaWrite.append(spark, t,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1))
      val before = idMap(t)
      // the parquet-manifest flavor is the regression: a manifest schema
      // without domainMetadata would drop the mark here, and the
      // post-cleanup append would hand out ids from 0 again
      DeltaWrite.checkpointV2(spark, t, jsonManifest = json)
      DeltaWrite.cleanupMetadata(spark, t)
      val snap = DeltaLog.snapshot(spark, t)
      assert(DeltaLog.rowIdHighWaterMark(snap) == 2L,
        s"manifest (json=$json) lost the high-water mark")
      DeltaWrite.append(spark, t, Seq((4L, "d")).toDF("k", "v").coalesce(1))
      val after = idMap(t)
      assert(after(4L)._1 == 3L, s"json=$json: id reused after cleanup: $after")
      assert(before.forall { case (k, idv) => after(k) == idv })
    }
  }

  test("setProperties refuses to flip delta.enableRowTracking either way") {
    import spark.implicits._
    val t = tmpDir("rt-setprops").resolve("t").toString
    create(t)
    val e = intercept[IllegalArgumentException](
      DeltaWrite.setProperties(spark, t, Map("delta.enableRowTracking" -> "false")))
    assert(e.getMessage.contains("enableRowTracking"), e.getMessage)

    val plain = tmpDir("rt-setprops-plain").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, plain,
      StructType(Seq(StructField("k", LongType))))
    val e2 = intercept[IllegalArgumentException](
      DeltaWrite.setProperties(spark, plain, Map("delta.enableRowTracking" -> "true")))
    assert(e2.getMessage.contains("enableRowTracking"), e2.getMessage)
    // unrelated property changes on a tracked table still land
    DeltaWrite.setProperties(spark, t, Map("graft.note" -> "x"))
    assert(DeltaLog.snapshot(spark, t).configuration.get("graft.note").contains("x"))
  }

  test("readCdf on a tracked table derives deletes from prior state carrying row-id columns") {
    import spark.implicits._
    val t = tmpDir("rt-cdf").resolve("t").toString
    create(t, Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    // a remove-only commit (restore to the empty table) exercises the
    // delete-derivation path that reads the PREVIOUS version's add index —
    // whose rows now carry baseRowId columns
    DeltaWrite.restore(spark, t, 0L)
    // third param is fromVersionExclusive: 0L includes version 1's inserts
    val cdf = DeltaLog.readCdf(spark, t, 0L, Some(DeltaLog.snapshot(spark, t).version))
      .select(col("k"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(cdf.count(_._2 == "insert") == 2 && cdf.count(_._2 == "delete") == 2, cdf.toSeq)
  }

  test("cleanupMetadata never seeds from an incomplete multi-part checkpoint") {
    import spark.implicits._
    val t = tmpDir("rt-cleanup").resolve("t")
    val ts = t.toString
    DeltaWrite.createIfAbsent(spark, ts,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))
    DeltaWrite.append(spark, ts, Seq((1L, "a")).toDF("k", "v"))
    DeltaWrite.append(spark, ts, Seq((2L, "b")).toDF("k", "v"))
    DeltaWrite.checkpoint(spark, ts) // complete classic checkpoint @ v2
    DeltaWrite.append(spark, ts, Seq((3L, "c")).toDF("k", "v")) // v3
    // fake a CRASHED multi-part publish at v3: part 1 of 2 only
    val log = t.resolve("_delta_log")
    val cpFile = java.nio.file.Files.list(log).iterator()
    var src: java.nio.file.Path = null
    while (cpFile.hasNext) {
      val p = cpFile.next()
      if (p.getFileName.toString.endsWith(".checkpoint.parquet")) src = p
    }
    java.nio.file.Files.copy(src,
      log.resolve(f"${3L}%020d.checkpoint.${1L}%010d.${2L}%010d.parquet"))
    // cleanup must treat v2 (complete) as newest — NOT the partial v3 set:
    // deleting commit 3 would lose k=3 forever
    DeltaWrite.cleanupMetadata(spark, ts)
    assert(java.nio.file.Files.exists(log.resolve(f"${3L}%020d.json")),
      "cleanup deleted the commit above an incomplete checkpoint")
    assert(DeltaLog.read(spark, ts).count() == 3)
    // a COMPLETE multi-part set at v3 is a valid seed: add part 2, rerun
    java.nio.file.Files.copy(src,
      log.resolve(f"${3L}%020d.checkpoint.${2L}%010d.${2L}%010d.parquet"))
    DeltaWrite.cleanupMetadata(spark, ts)
    assert(!java.nio.file.Files.exists(log.resolve(f"${2L}%020d.json")))
  }
}
