package graft.sources

import graft.SparkSpec
import graft.destinations.DeltaWrite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the r18 small-log DRIVER replay identical to the distributed add
  * index: `graft.delta.driverReplayMaxBytes = 0` forces the distributed
  * path, the default engages the driver path, and every snapshot surface
  * (files, filesWhere, liveFileStats, readWhere pruning) must agree on a
  * lifecycle that exercises adds, removes, same-commit remove+re-add (DV
  * updates), partition values, row-id fields and stats strings.
  */
class DeltaDriverReplaySpec extends SparkSpec {

  private def filesOf(t: String): Seq[DeltaLog.AddFile] =
    DeltaLog.snapshot(spark, t).files
      .sortBy(_.path)

  private def withDistributed[A](body: => A): A = {
    spark.conf.set("graft.delta.driverReplayMaxBytes", "0")
    try body finally spark.conf.unset("graft.delta.driverReplayMaxBytes")
  }

  test("driver replay equals the distributed index across a DV + row-tracking lifecycle") {
    import spark.implicits._
    val dir = tmpDir("ddr-life")
    val t = dir.resolve("t").toString
    val docs = (1L to 300L).map(i => (i, s"g${i % 3}", s"text-$i"))
      .toDF("id", "g", "txt")
    DeltaWrite.createIfAbsent(spark, t,
      docs.schema.asInstanceOf[StructType], partitionBy = Seq("g"),
      properties = Map(
        "delta.enableRowTracking" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    DeltaWrite.append(spark, t, docs.filter(col("id") <= 200).repartition(2))
    DeltaWrite.append(spark, t, docs.filter(col("id") > 200))
    DeltaWrite.upsert(spark, t,
      docs.filter(col("id") % 5 === 0)
        .select(col("id"), col("g"), upper(col("txt")).as("txt")), Seq("id"))
    DeltaWrite.delete(spark, t, "id % 7 = 0") // DV remove+re-add same commit

    val driver = filesOf(t)
    val dist = withDistributed(filesOf(t))
    assert(driver === dist)
    assert(driver.exists(_.deletionVector.isDefined),
      "lifecycle must exercise DV descriptors through the replay")
    assert(driver.exists(_.baseRowId.isDefined))
    assert(driver.exists(_.partitionValues.nonEmpty))

    // lazy-snapshot surfaces
    val lsD = DeltaLog.lazySnapshot(spark, t)
    val (nD, bD) = lsD.liveFileStats()
    val whereD = lsD.filesWhere(_.deletionVector.isDefined).sortBy(_.path)
    val (nX, bX, whereX) = withDistributed {
      val ls = DeltaLog.lazySnapshot(spark, t)
      val (n, b) = ls.liveFileStats()
      (n, b, ls.filesWhere(_.deletionVector.isDefined).sortBy(_.path))
    }
    assert((nD, bD) === ((nX, bX)))
    assert(whereD === whereX)

    // stats-pruned read path agrees (planned-file counter included)
    val outD = DeltaLog.readWhere(spark, t, "id >= 250").orderBy("id").collect()
    val plannedD = DeltaLog.lastReadWherePlan.get.planned
    val (outX, plannedX) = withDistributed {
      val o = DeltaLog.readWhere(spark, t, "id >= 250").orderBy("id").collect()
      (o, DeltaLog.lastReadWherePlan.get.planned)
    }
    assert(plannedD === plannedX)
    assert(outD === outX)
  }

  test("small checkpointed logs driver-replay; results equal the distributed path") {
    import spark.implicits._
    val dir = tmpDir("ddr-cp")
    val t = dir.resolve("t").toString
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v")
    DeltaWrite.createIfAbsent(spark, t, df.schema.asInstanceOf[StructType])
    (1 to 11).foreach { i => // crosses the checkpoint interval (10)
      DeltaWrite.append(spark, t, df.filter(col("id") % 11 === i % 11).coalesce(1))
    }
    val snap = DeltaLog.snapshot(spark, t)
    val dist = withDistributed(DeltaLog.snapshot(spark, t))
    assertSnapshotsEqual(snap, dist)
    assert(DeltaLog.read(spark, t).count() === 100L)
  }

  /** Snapshot equality with flavor-robust metaDataRaw: the JSON-manifest
    * distributed path renders metaData through an INFERRED schema whose
    * field order may differ from the file's — every consumer parses it by
    * name, so compare as parsed nodes and the rest structurally. */
  private def assertSnapshotsEqual(a: DeltaLog.Snapshot, b: DeltaLog.Snapshot): Unit = {
    assert(a.version === b.version)
    assert(a.schema === b.schema)
    assert(a.partitionColumns === b.partitionColumns)
    assert(a.files.sortBy(_.path) === b.files.sortBy(_.path))
    assert(a.protocol === b.protocol)
    assert(a.configuration === b.configuration)
    assert(a.txns === b.txns)
    assert(a.domainMetadata === b.domainMetadata)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(a.metaDataRaw.isDefined === b.metaDataRaw.isDefined)
    a.metaDataRaw.zip(b.metaDataRaw).foreach { case (x, y) =>
      assert(m.readTree(x) === m.readTree(y), s"metaDataRaw diverges: $x vs $y")
    }
  }

  test("driver checkpoint parse equals the distributed path: classic, multi-part, v2+sidecars") {
    import spark.implicits._
    val dir = tmpDir("ddr-cpkinds")
    val docs = (1L to 300L).map(i => (i, s"g${i % 3}", s"text-$i"))
      .toDF("id", "g", "txt")

    def lifecycle(t: String, props: Map[String, String])(
        mkCheckpoint: String => Unit): Unit = {
      DeltaWrite.createIfAbsent(spark, t,
        docs.schema.asInstanceOf[StructType], partitionBy = Seq("g"),
        properties = props)
      DeltaWrite.append(spark, t, docs.filter(col("id") <= 200).repartition(2))
      DeltaWrite.upsert(spark, t,
        docs.filter(col("id") % 5 === 0)
          .select(col("id"), col("g"), upper(col("txt")).as("txt")), Seq("id"))
      mkCheckpoint(t)
      // tail commits on top of the checkpoint: the replay must reconcile
      // checkpoint adds with post-checkpoint adds AND removes
      DeltaWrite.append(spark, t, docs.filter(col("id") > 200))
      DeltaWrite.delete(spark, t, "id % 7 = 0")
      val driver = DeltaLog.snapshot(spark, t)
      val dist = withDistributed(DeltaLog.snapshot(spark, t))
      assertSnapshotsEqual(driver, dist)
      val lsD = DeltaLog.lazySnapshot(spark, t)
      val lsX = withDistributed(DeltaLog.lazySnapshot(spark, t))
      assertSnapshotsEqual(lsD.meta, lsX.meta)
      assert(lsD.liveFileStats() === withDistributed(lsX.liveFileStats()))
      assert(lsD.filesWhere(_.partitionValues.get("g").contains("g1")).sortBy(_.path)
        === withDistributed(lsX.filesWhere(_.partitionValues.get("g").contains("g1"))
          .sortBy(_.path)))
    }

    // classic single-file checkpoint, DV + row tracking in the adds
    lifecycle(dir.resolve("classic").toString,
      Map("delta.enableRowTracking" -> "true",
        "delta.enableDeletionVectors" -> "true")) { t =>
      DeltaWrite.checkpoint(spark, t): Unit
    }
    // multi-part classic checkpoint (tiny partActions forces several parts)
    lifecycle(dir.resolve("multipart").toString, Map.empty) { t =>
      DeltaWrite.checkpoint(spark, t, partActions = 2): Unit
    }
    // v2 checkpoint: parquet manifest + parquet sidecars
    lifecycle(dir.resolve("v2").toString,
      Map("delta.checkpointPolicy" -> "v2")) { t =>
      DeltaWrite.checkpointV2(spark, t, partActions = 2): Unit
    }
  }
}
