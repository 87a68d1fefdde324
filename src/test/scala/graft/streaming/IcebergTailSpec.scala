package graft.streaming

import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.destinations.IcebergWrite
import graft.sources.IcebergRead

/** Continuous Iceberg streaming source ([[IcebergTailSource]],
  * `format("graft-iceberg")`): initial snapshot + append tailing,
  * compaction invisibility, delete/overwrite refusal vs skip options,
  * checkpoint resume, and crash recovery pinned to the ORIGINAL snapshot.
  */
class IcebergTailSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def rows(from: Long, to: Long) = {
    import spark.implicits._
    (from to to).map(i => (i, s"v$i")).toDF("id", "v")
  }

  /** Drain every available batch into `sink` (a delta-style collector):
    * returns the per-batch row sets, in order. */
  private def drain(table: String, cp: String,
      options: Map[String, String] = Map.empty): Seq[Set[Long]] = {
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val reader = spark.readStream.format("graft-iceberg")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(table)
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = batch.collect().map(_.getLong(0)).toSet
        if (ids.nonEmpty) batches.synchronized { batches += ids; () }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    batches.toSeq
  }

  test("initial snapshot then append tailing; compactions invisible; checkpoint resumes") {
    val root = tmpDir("icetail-basic")
    val t = root.resolve("t").toString
    val cp = root.resolve("cp").toString
    IcebergWrite.create(spark, t, schema)
    IcebergWrite.append(spark, t, rows(1, 5))
    IcebergWrite.append(spark, t, rows(6, 8))
    // run 1: both appends arrive as ONE initial-snapshot batch
    val run1 = drain(t, cp)
    assert(run1 == Seq((1L to 8L).toSet), run1)
    // new appends + a rewrite: the tail sees exactly the new rows, once
    IcebergWrite.append(spark, t, rows(9, 10))
    IcebergWrite.rewriteDataFiles(spark, t) // layout-only: must be invisible
    IcebergWrite.append(spark, t, rows(11, 11))
    val run2 = drain(t, cp)
    assert(run2.flatten.toSet == Set(9L, 10L, 11L), run2)
    // nothing new: an idle run delivers nothing
    assert(drain(t, cp).isEmpty)
  }

  test("delete snapshots refuse by default and skip with the option") {
    val root = tmpDir("icetail-delete")
    val t = root.resolve("t").toString
    val cp = root.resolve("cp").toString
    IcebergWrite.create(spark, t, schema)
    IcebergWrite.append(spark, t, rows(1, 6))
    assert(drain(t, cp) == Seq((1L to 6L).toSet))
    IcebergWrite.deleteWhere(spark, t, rows(2, 2).select("id"))
    IcebergWrite.append(spark, t, rows(7, 8))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, cp)
    }
    assert(e.getCause.getMessage.contains("skipDeleteSnapshots"), e.getCause.getMessage)
    // with the skip option the delete passes over and the append lands
    val got = drain(t, cp, Map("skipDeleteSnapshots" -> "true"))
    assert(got.flatten.toSet == Set(7L, 8L), got)
  }

  test("maxSnapshotsPerTrigger: tail batches are snapshot-granular and rate-limited") {
    val root = tmpDir("icetail-rate")
    val t = root.resolve("t").toString
    val cp = root.resolve("cp").toString
    IcebergWrite.create(spark, t, schema)
    IcebergWrite.append(spark, t, rows(1, 2))
    assert(drain(t, cp).size == 1) // initial
    IcebergWrite.append(spark, t, rows(3, 4))
    IcebergWrite.append(spark, t, rows(5, 6))
    IcebergWrite.append(spark, t, rows(7, 8))
    val got = drain(t, cp, Map("maxSnapshotsPerTrigger" -> "1"))
    assert(got == Seq(Set(3L, 4L), Set(5L, 6L), Set(7L, 8L)), got)
  }

  test("crash recovery: a replayed initial batch reads the ORIGINAL snapshot after the table advanced") {
    val root = tmpDir("icetail-crash")
    val t = root.resolve("t").toString
    val cp = root.resolve("cp")
    IcebergWrite.create(spark, t, schema)
    IcebergWrite.append(spark, t, rows(1, 4))
    assert(drain(t, cp.toString) == Seq((1L to 4L).toSet))
    // snapshot the checkpoint, advance the table, then roll back — the
    // restarted stream replays nothing extra and the committed offset's
    // snapshot id still resolves
    def copyDir(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
        else { java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(p, dst): Unit }
      }
    }
    val cpCopy = root.resolve("cp-copy")
    copyDir(cp, cpCopy)
    IcebergWrite.append(spark, t, rows(5, 6))
    // crash simulation: restore the pre-advance checkpoint; the replayed
    // run re-plans from the INITIAL offset (pinned snapshot id) and then
    // tails the new append — rows 1-4 must come from the original
    // snapshot, never doubled, and 5-6 arrive exactly once
    org.apache.commons.io.FileUtils.deleteDirectory(cp.toFile)
    copyDir(cpCopy, cp)
    val got = drain(t, cp.toString)
    assert(got.flatten.toSet == Set(5L, 6L), got)
    // the stream view equals the table
    assert(IcebergRead.read(spark, t).count() == 6L)
  }
}
