package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.destinations.IcebergV1Fixture

/** Iceberg FORMAT-VERSION 1 read support over the hand-built legacy
  * fixture ([[IcebergV1Fixture]]): singular `schema`/`partition-spec`
  * metadata (no v2 lists, no version hint), inline `manifests` snapshot
  * arrays, v1 manifest-list column spellings, sequence-free manifest
  * entries, and id-free data parquet.
  */
class IcebergV1Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def fixture(): (String, Seq[Long]) = {
    val tbl = tmpDir("iceberg-v1").resolve("t").toString
    val b1 = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "a"), Row(2L, "b"), Row(3L, "c")), 1), schema)
    val b2 = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(4L, "d"), Row(5L, "e")), 1), schema)
    (tbl, IcebergV1Fixture.write(spark, tbl, Seq(b1, b2)))
  }

  test("current read serves both v1 commits (legacy manifest list)") {
    val (tbl, _) = fixture()
    val got = IcebergRead.read(spark, tbl)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))
  }

  test("time travel to the inline-`manifests` first snapshot") {
    val (tbl, snaps) = fixture()
    val got = IcebergRead.read(spark, tbl,
      IcebergRead.Options(snapshotId = Some(snaps.head)))
      .orderBy("id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L, 3L))
    // plan stats: one synthesized manifest record, opened, both planned
    val st = IcebergRead.lastPlanStats.get
    assert(st.manifestsTotal == 1 && st.manifestsOpened == 1)
  }

  test("tableSchema resolves the legacy singular `schema` field") {
    val (tbl, _) = fixture()
    assert(IcebergRead.tableSchema(spark, tbl).fieldNames.toSeq ==
      Seq("id", "name"))
  }

  test("metadata tables tolerate v1 shapes") {
    val (tbl, snaps) = fixture()
    val snapRows = IcebergRead.snapshots(spark, tbl)
      .orderBy("snapshot_id").collect()
    assert(snapRows.map(_.getAs[Long]("snapshot_id")).toSeq == snaps)
    // the inline-manifests snapshot has no manifest-list path
    assert(snapRows.head.getAs[String]("manifest_list") == null)
    assert(snapRows.last.getAs[String]("manifest_list") != null)

    val mans = IcebergRead.manifests(spark, tbl).collect()
    assert(mans.length == 2) // the v1 list carries both commits' manifests
    assert(mans.map(_.getAs[Int]("added_data_files_count")).sum == 2)
    assert(mans.forall(_.getAs[Long]("sequence_number") == 0L))

    val files = IcebergRead.files(spark, tbl).collect()
    assert(files.length == 2 && files.forall(_.getAs[Int]("content") == 0))
    assert(files.map(_.getAs[Long]("record_count")).sum == 5L)

    val hist = IcebergRead.history(spark, tbl).collect()
    assert(hist.length == 2 && hist.forall(_.getAs[Boolean]("is_current_ancestor")))
  }

  test("pruning hint still subtracts v1 files via the identity fallback") {
    // unpartitioned: where-hint derives nothing, but must not break
    val (tbl, _) = fixture()
    val got = IcebergRead.read(spark, tbl,
      IcebergRead.Options(where = Some("id >= 4")))
      .filter(col("id") >= 4).orderBy("id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(4L, 5L))
  }

  test("format-version 4 still refused loudly (v3 reads since r17)") {
    val (tbl, _) = fixture()
    // rewrite the metadata to claim a future version
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new org.apache.hadoop.fs.Path(
      fs.makeQualified(new org.apache.hadoop.fs.Path(tbl)), "metadata")
    val md = IcebergRead.currentMetadata(fs, metaDir)
    md.put("format-version", 4)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(metaDir, "v3.metadata.json"), true)
    try out.write(md.toString.getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalArgumentException](IcebergRead.read(spark, tbl))
    assert(e.getMessage.contains("format-version"))
  }
}
