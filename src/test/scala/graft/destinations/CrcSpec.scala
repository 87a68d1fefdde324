package graft.destinations

import graft.SparkSpec
import graft.config.ReplaceCondition
import graft.sources.DeltaLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Version checksums (`<v>.crc`, delta-spark's VersionChecksum): every
  * commit summarizes the post-commit table state; `verifyChecksum`
  * re-derives that state from the actual log replay as ONE distributed
  * aggregate and refuses loudly on divergence. The chain must stay exact
  * through every write shape — the incremental arithmetic silently drifting
  * is precisely the bug class checksums exist to catch, so the spec drives
  * the whole write surface through it.
  */
class CrcSpec extends SparkSpec {
  import spark.implicits._

  private def crcFiles(table: String): Seq[String] = {
    val d = new java.io.File(s"$table/_delta_log")
    // hadoop's LocalFileSystem writes hidden `.name.crc` transport
    // sidecars for every file; only the visible Delta checksums count
    d.listFiles().toSeq.map(_.getName)
      .filter(n => n.endsWith(".crc") && !n.startsWith(".")).sorted
  }

  test("the chain stays exact through append/DV-delete/compact/upsert/replace/overwrite") {
    val table = tmpDir("crc-chain").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      properties = Map("delta.enableDeletionVectors" -> "true"))
    DeltaWrite.append(spark, table,
      (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v").repartition(2)) // v1
    DeltaWrite.append(spark, table,
      (41L to 60L).map(i => (i, s"v$i")).toDF("k", "v").repartition(1)) // v2
    DeltaWrite.delete(spark, table, "k % 7 = 0")                        // v3 (DV)
    DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)        // v4
    DeltaWrite.upsert(spark, table,
      Seq((5L, "five"), (100L, "hundred")).toDF("k", "v"), Seq("k"))    // v5
    DeltaWrite.replace(spark, table,
      Seq((200L, "two-hundred")).toDF("k", "v"),
      Seq(ReplaceCondition("v", "five")))                               // v6
    val latest = DeltaLog.snapshot(spark, table).version
    assert(latest == 6L)
    // every version wrote its checksum, and every one audits clean
    assert(crcFiles(table).size == 7)
    (0L to latest).foreach { v =>
      assert(DeltaLog.verifyChecksum(spark, table, Some(v)),
        s"version $v has no checksum to audit")
    }
    // overwrite (remove-everything shape) keeps the chain going
    DeltaWrite.overwrite(spark, table, Seq((1L, "fresh")).toDF("k", "v"))
    assert(DeltaLog.verifyChecksum(spark, table, None))
  }

  test("clustering domain + stats backfill ride the chain; cleanup keeps the newest crc") {
    val table = tmpDir("crc-domains").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("x", LongType), StructField("y", LongType))))
    DeltaWrite.append(spark, table, (1L to 30L).map(i => (i, i * 7 % 30)).toDF("x", "y")
      .repartition(1))
    DeltaWrite.append(spark, table, (31L to 60L).map(i => (i, i * 7 % 30)).toDF("x", "y")
      .repartition(1))
    DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30,
      clusterBy = Seq("x", "y"), curve = "hilbert") // domain joins the chain
    assert(DeltaLog.verifyChecksum(spark, table, None))
    val crc = DeltaLog.readCrc(spark, table, 3L).get
    assert(crc.domainMetadata.exists(_.contains("delta.clustering")))
  }

  test("a tampered checksum is refused loudly, naming the divergent field") {
    val table = tmpDir("crc-tamper").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", LongType))))
    DeltaWrite.append(spark, table, Seq(1L, 2L, 3L).toDF("k").repartition(1))
    val p = java.nio.file.Paths.get(
      DeltaLog.crcPath(table, 1L).toUri.getPath)
    val tampered = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replaceFirst("\"numFiles\":1", "\"numFiles\":7")
    java.nio.file.Files.write(p, tampered.getBytes("UTF-8"))
    // drop hadoop's transport-checksum sidecar so the tampered bytes are
    // actually readable (we are simulating corruption at the SOURCE)
    java.nio.file.Files.deleteIfExists(
      p.getParent.resolve("." + p.getFileName.toString + ".crc"))
    val e = intercept[IllegalStateException](
      DeltaLog.verifyChecksum(spark, table, Some(1L)))
    assert(e.getMessage.contains("numFiles"), e.getMessage)
    // a swapped-in metadata object (different schema/id) is also refused
    val tampered2 = tampered
      .replaceFirst("\"numFiles\":7", "\"numFiles\":1")
      .replaceFirst("\"id\":\"", "\"id\":\"not-")
    java.nio.file.Files.write(p, tampered2.getBytes("UTF-8"))
    val e2 = intercept[IllegalStateException](
      DeltaLog.verifyChecksum(spark, table, Some(1L)))
    assert(e2.getMessage.contains("metadata"), e2.getMessage)
    // absent checksum = nothing to audit, never an error
    java.nio.file.Files.delete(p)
    assert(!DeltaLog.verifyChecksum(spark, table, Some(1L)))
  }

  test("repairChecksum restarts a severed chain; later commits extend it again") {
    val table = tmpDir("crc-repair").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", LongType))))
    DeltaWrite.append(spark, table, Seq(1L, 2L).toDF("k").repartition(1)) // v1
    // sever: the latest crc vanishes (crashed write / foreign writer)
    val p = java.nio.file.Paths.get(DeltaLog.crcPath(table, 1L).toUri.getPath)
    java.nio.file.Files.delete(p)
    java.nio.file.Files.deleteIfExists(
      p.getParent.resolve("." + p.getFileName.toString + ".crc"))
    assert(!DeltaLog.verifyChecksum(spark, table, Some(1L)))
    // …and the severed chain does NOT resume by itself
    DeltaWrite.append(spark, table, Seq(3L).toDF("k").repartition(1)) // v2
    assert(!DeltaLog.verifyChecksum(spark, table, None))
    // repair recomputes the CURRENT version exactly; the next commit
    // extends incrementally from it
    assert(DeltaWrite.repairChecksum(spark, table) == 2L)
    assert(DeltaLog.verifyChecksum(spark, table, None))
    DeltaWrite.append(spark, table, Seq(4L).toDF("k").repartition(1)) // v3
    assert(DeltaLog.verifyChecksum(spark, table, None))
  }

  test("restore recomputes the checksum exactly (re-add-without-remove shape)") {
    val table = tmpDir("crc-restore").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", LongType))))
    DeltaWrite.append(spark, table, (1L to 10L).toDF("k").repartition(1)) // v1
    DeltaWrite.append(spark, table, (11L to 20L).toDF("k").repartition(1)) // v2
    DeltaWrite.delete(spark, table, "k <= 5")                             // v3
    DeltaWrite.restore(spark, table, 1L)                                  // v4
    assert(DeltaLog.verifyChecksum(spark, table, None))
    assert(DeltaLog.read(spark, table).count() == 10)
  }

  test("the table id is stable identity: evolution, properties and renames never change it") {
    val table = tmpDir("crc-tableid").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      columnMapping = true)
    def id() = DeltaLog.tableId(DeltaLog.snapshot(spark, table)).get
    val created = id()
    DeltaWrite.append(spark, table,
      Seq((1L, "x", 0.5)).toDF("k", "v", "w"), mergeSchema = true)
    assert(id() == created, "mergeSchema append changed the table id")
    DeltaWrite.setProperties(spark, table, Map("delta.appendOnly" -> "false"))
    assert(id() == created, "setProperties changed the table id")
    DeltaWrite.renameColumn(spark, table, "v", "label")
    assert(id() == created, "rename changed the table id")
    DeltaWrite.dropColumn(spark, table, "w")
    assert(id() == created, "drop changed the table id")
  }
}
