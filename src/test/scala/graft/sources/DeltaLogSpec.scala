package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Generated `_delta_log` fixtures exercising the public Delta protocol:
  * JSON commits with metaData/add/remove, URL-encoded relative paths,
  * partition values injected from the log (Delta data files do not embed
  * partition columns), version/timestamp travel, and checkpoint seeding.
  */
class DeltaLogSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{}},
      |{"name":"v","type":"string","nullable":true,"metadata":{}},
      |{"name":"part","type":"string","nullable":true,"metadata":{}}]}"""
      .stripMargin.replace("\n", "")

  /** Write one data parquet (id, v) under the table dir; returns rel path. */
  private def dataFile(table: java.nio.file.Path, rel: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = table.resolve("_tmp_write")
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.move(part, dest)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }

  private def commit(table: java.nio.file.Path, version: Long, lines: Seq[String]): Unit = {
    val log = table.resolve("_delta_log")
    java.nio.file.Files.createDirectories(log)
    java.nio.file.Files.writeString(log.resolve(f"$version%020d.json"),
      lines.mkString("", "\n", "\n"))
  }

  private def metaLine: String =
    s"""{"metaData":{"id":"fixture","schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(schemaJson)},"partitionColumns":["part"],"format":{"provider":"parquet"}}}"""

  private def addLine(path: String, part: String): String =
    s"""{"add":{"path":"$path","partitionValues":{"part":"$part"},"size":1,"modificationTime":1,"dataChange":true}}"""

  test("snapshot replay: add/remove across commits, partition injection, time travel") {
    val table = tmpDir("delta-fix")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one"), (2L, "two")))
    dataFile(table, "part=b/f2.parquet", Seq((3L, "three")))
    dataFile(table, "part=a/f3.parquet", Seq((4L, "four")))
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine,
      addLine("part=a/f1.parquet", "a"),
      addLine("part=b/f2.parquet", "b")))
    // v1: adds f3, removes f1 — and the path is URL-encoded to exercise decode
    commit(table, 1L, Seq(
      addLine("part%3Da/f3.parquet", "a"),
      """{"remove":{"path":"part=a/f1.parquet","dataChange":true}}"""))

    val latest = DeltaLog.read(spark, table.toString).orderBy("id").collect()
    assert(latest.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((3L, "three", "b"), (4L, "four", "a")))

    val v0 = DeltaLog.read(spark, table.toString, versionAsOf = Some(0L)).orderBy("id").collect()
    assert(v0.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // partition column comes from the log, not the files
    assert(v0.map(_.getString(2)).toSeq == Seq("a", "a", "b"))

    // timestamp travel: anything after the last commit's mtime sees latest
    val ts = java.time.Instant.now().plusSeconds(60)
    assert(DeltaLog.read(spark, table.toString, timestampAsOf = Some(ts)).count() == 2)

    val snap = DeltaLog.snapshot(spark, table.toString)
    assert(snap.version == 1L && snap.partitionColumns == Seq("part"))
    assert(snap.files.map(_.path).toSet ==
      Set("part=b/f2.parquet", "part%3Da/f3.parquet"))
  }

  test("checkpoint seeds the state; later JSON commits replay on top") {
    val table = tmpDir("delta-cp")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one")))
    dataFile(table, "part=b/f2.parquet", Seq((2L, "two")))
    commit(table, 0L, Seq(metaLine, addLine("part=a/f1.parquet", "a")))

    // checkpoint at version 0 carrying the complete state (metaData + add),
    // written as parquet with the protocol's column layout plus extras
    import spark.implicits._
    val cp = Seq(
      (Some(("part=a/f1.parquet", Map("part" -> "a"))), None: Option[String],
        Some((schemaJson, Seq("part")))))
      .toDF("addRaw", "removeRaw", "metaRaw")
      .select(
        struct(col("addRaw._1").as("path"), col("addRaw._2").as("partitionValues")).as("add"),
        struct(col("removeRaw").as("path")).as("remove"),
        struct(col("metaRaw._1").as("schemaString"),
          col("metaRaw._2").as("partitionColumns")).as("metaData"))
    val cpTmp = table.resolve("_cp_tmp")
    cp.coalesce(1).write.parquet(cpTmp.toString)
    val part = java.nio.file.Files.list(cpTmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part,
      table.resolve("_delta_log").resolve(f"${0L}%020d.checkpoint.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(cpTmp.toFile)

    // v1 exists only as JSON: adds f2
    commit(table, 1L, Seq(addLine("part=b/f2.parquet", "b")))

    val rows = DeltaLog.read(spark, table.toString).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("a `type: delta` pipeline source opens a real Delta table via the bridge") {
    val table = tmpDir("delta-src")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one"), (2L, "two")))
    commit(table, 0L, Seq(metaLine, addLine("part=a/f1.parquet", "a")))
    val src = graft.config.ManagedTableSource("delta_in", graft.config.Location(table.toString))
    val df = Sources.load(spark, src)
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(df.columns.toSeq == Seq("id", "v", "part"))
    // version travel flows through the same config field
    val v0 = Sources.load(spark,
      src.copy(version = Some(0L)))
    assert(v0.count() == 2)
  }

  test("filter pushdown and column pruning reach the parquet scans through the bridge") {
    val table = tmpDir("delta-push")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one"), (2L, "two")))
    dataFile(table, "part=b/f2.parquet", Seq((3L, "three")))
    commit(table, 0L, Seq(metaLine,
      addLine("part=a/f1.parquet", "a"), addLine("part=b/f2.parquet", "b")))
    val df = DeltaLog.read(spark, table.toString)
      .filter(col("id") > 1L).select("id", "part")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the bridge is a union of per-partition scans — the filter must reach
    // EVERY scan, and the untouched `v` column must be pruned from reads
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"), p)
    assert(p.contains("ReadSchema: struct<id:bigint>"), p)
    assert(!p.contains("v:string"), s"v should be pruned from every scan:\n$p")
    assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))

    // partition pruning: the injected partition literal constant-folds, so
    // a partition filter must ELIMINATE non-matching scan branches, not
    // just filter their rows
    val dfa = DeltaLog.read(spark, table.toString).filter(col("part") === "a")
    val pa = dfa.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scans = "Location: InMemoryFileIndex".r.findAllIn(pa).size
    assert(scans == 1, s"expected 1 surviving scan branch, got $scans:\n$pa")
    assert(pa.contains("part=a"), pa)
    assert(!pa.contains("part=b"), s"part=b branch should be pruned:\n$pa")
    assert(dfa.count() == 2)
  }

  test("protocol gate: unsupported reader features refuse; supported or unused ones read") {
    // v3 protocol whose features we implement (or that are enabled-but-
    // unused, like deletionVectors on delta 3.x defaults) must read fine
    val ok = tmpDir("delta-proto-ok")
    dataFile(ok, "part=a/f1.parquet", Seq((1L, "one")))
    commit(ok, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz","deletionVectors"],"writerFeatures":["timestampNtz","deletionVectors","appendOnly"]}}""",
      metaLine, addLine("part=a/f1.parquet", "a")))
    assert(DeltaLog.read(spark, ok.toString).count() == 1)
    val snap = DeltaLog.snapshot(spark, ok.toString)
    assert(snap.protocol.exists(p =>
      p.minReaderVersion == 3 && p.readerFeatures.contains("deletionVectors")))

    // a feature we genuinely don't implement refuses loudly, naming it
    // (v2Checkpoint moved to the supported set in r10, typeWidening in r13)
    val bad = tmpDir("delta-proto-bad")
    dataFile(bad, "part=a/f1.parquet", Seq((1L, "one")))
    commit(bad, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["collations-preview"],"writerFeatures":["collations-preview"]}}""",
      metaLine, addLine("part=a/f1.parquet", "a")))
    val e = intercept[IllegalArgumentException](DeltaLog.read(spark, bad.toString))
    assert(e.getMessage.contains("collations-preview"), e.getMessage)

    // legacy minReaderVersion 2 implies column mapping, which IS
    // implemented — a v2 table (here with mode none) reads fine
    val cm = tmpDir("delta-proto-cm")
    dataFile(cm, "part=a/f1.parquet", Seq((1L, "one")))
    commit(cm, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaLine, addLine("part=a/f1.parquet", "a")))
    assert(DeltaLog.read(spark, cm.toString).count() == 1)

    // a reader version beyond anything this bridge knows refuses
    val hv = tmpDir("delta-proto-hv")
    dataFile(hv, "part=a/f1.parquet", Seq((1L, "one")))
    commit(hv, 0L, Seq(
      """{"protocol":{"minReaderVersion":4,"minWriterVersion":8,"readerFeatures":["somethingNew"]}}""",
      metaLine, addLine("part=a/f1.parquet", "a")))
    val e3 = intercept[IllegalArgumentException](DeltaLog.snapshot(spark, hv.toString))
    assert(e3.getMessage.contains("somethingNew"), e3.getMessage)
  }

  test("timestamp travel prefers in-commit timestamps over file mtimes") {
    val table = tmpDir("delta-ict")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one")))
    dataFile(table, "part=a/f2.parquet", Seq((2L, "two")))
    // both commit FILES are written "now", but their in-commit clocks say
    // v0 = 1 000 000, v1 = 2 000 000 — travel must follow the latter
    commit(table, 0L, Seq(
      """{"commitInfo":{"timestamp":1000000,"inCommitTimestamp":1000000,"operation":"WRITE"}}""",
      metaLine, addLine("part=a/f1.parquet", "a")))
    commit(table, 1L, Seq(
      """{"commitInfo":{"timestamp":2000000,"inCommitTimestamp":2000000,"operation":"WRITE"}}""",
      addLine("part=a/f2.parquet", "a")))
    val atV0 = DeltaLog.read(spark, table.toString,
      timestampAsOf = Some(java.time.Instant.ofEpochMilli(1500000L)))
    assert(atV0.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val atV1 = DeltaLog.read(spark, table.toString,
      timestampAsOf = Some(java.time.Instant.ofEpochMilli(2000000L)))
    assert(atV1.count() == 2)
    // before the first in-commit timestamp: no version exists yet, even
    // though the files' mtimes are in the past relative to "now"
    val e = intercept[IllegalArgumentException](DeltaLog.read(spark, table.toString,
      timestampAsOf = Some(java.time.Instant.ofEpochMilli(999999L))))
    assert(e.getMessage.contains("no Delta version"), e.getMessage)
  }

  test("txn actions replay into the snapshot (latest per appId wins)") {
    val table = tmpDir("delta-txn")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one")))
    commit(table, 0L, Seq(metaLine, addLine("part=a/f1.parquet", "a"),
      """{"txn":{"appId":"stream-1","version":4}}"""))
    commit(table, 1L, Seq(
      """{"txn":{"appId":"stream-1","version":5}}""",
      """{"txn":{"appId":"stream-2","version":1}}"""))
    val snap = DeltaLog.snapshot(spark, table.toString)
    assert(snap.txns == Map("stream-1" -> 5L, "stream-2" -> 1L))
    assert(DeltaLog.snapshot(spark, table.toString, versionAsOf = Some(0L)).txns ==
      Map("stream-1" -> 4L))
  }

  private def metaLineWith(config: String): String =
    s"""{"metaData":{"id":"fixture","schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(schemaJson)},"partitionColumns":["part"],"format":{"provider":"parquet"},"configuration":$config}}"""

  test("writer gate: table obligations are enforced or refused, never ignored") {
    import graft.destinations.DeltaWrite
    import spark.implicits._
    def freshTable(name: String, lines: Seq[String]): java.nio.file.Path = {
      val t = tmpDir(name)
      dataFile(t, "part=a/f1.parquet", Seq((1L, "one")))
      commit(t, 0L, lines :+ addLine("part=a/f1.parquet", "a"))
      t
    }
    val row = Seq((9L, "nine", "a")).toDF("id", "v", "part")

    // appendOnly: appends land, data-changing removes refuse
    val ao = freshTable("dw-appendonly", Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLineWith("""{"delta.appendOnly":"true"}""")))
    DeltaWrite.append(spark, ao.toString, row)
    assert(DeltaLog.read(spark, ao.toString).count() == 2)
    val e1 = intercept[IllegalArgumentException](
      DeltaWrite.upsert(spark, ao.toString, row, Seq("id")))
    assert(e1.getMessage.contains("append-only"), e1.getMessage)

    // CHECK constraints: ENFORCED per row (r8) — conforming rows land,
    // violating rows abort the write with the constraint named, and the
    // failed write leaves no commit behind
    val ck = freshTable("dw-check", Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""",
      metaLineWith("""{"delta.constraints.positive":"id > 0"}""")))
    DeltaWrite.append(spark, ck.toString, row)
    assert(DeltaLog.read(spark, ck.toString).count() == 2)
    val bad = Seq((-9L, "minus nine", "a")).toDF("id", "v", "part")
    val e2 = intercept[Exception](DeltaWrite.append(spark, ck.toString, bad))
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      val sb = new StringBuilder
      while (c != null) { sb.append(String.valueOf(c.getMessage)); c = c.getCause }
      sb.toString
    }
    assert(rootMsg(e2).contains("positive"), rootMsg(e2))
    assert(DeltaLog.snapshot(spark, ck.toString).version == 1L) // no commit landed
    assert(DeltaLog.read(spark, ck.toString).count() == 2)

    // identity columns still refuse — no high-water-mark protocol here
    val idMeta =
      s"""{"metaData":{"id":"fixture","schemaString":"{\\"type\\":\\"struct\\",\\"fields\\":[{\\"name\\":\\"id\\",\\"type\\":\\"long\\",\\"nullable\\":true,\\"metadata\\":{\\"delta.identity.start\\":1,\\"delta.identity.step\\":1}},{\\"name\\":\\"v\\",\\"type\\":\\"string\\",\\"nullable\\":true,\\"metadata\\":{}},{\\"name\\":\\"part\\",\\"type\\":\\"string\\",\\"nullable\\":true,\\"metadata\\":{}}]}","partitionColumns":["part"],"format":{"provider":"parquet"},"configuration":{}}}"""
    val idt = freshTable("dw-identity", Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":6}}""", idMeta))
    val e2b = intercept[IllegalArgumentException](
      DeltaWrite.append(spark, idt.toString, row))
    assert(e2b.getMessage.contains("identity"), e2b.getMessage)

    // a v7 writer feature we don't implement refuses by name
    // (icebergCompatV2 graduated to supported in r14, so use a future one)
    val rt = freshTable("dw-unknownfeat", Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["icebergCompatV9"]}}""",
      metaLine))
    val e3 = intercept[IllegalArgumentException](
      DeltaWrite.append(spark, rt.toString, row))
    assert(e3.getMessage.contains("icebergCompatV9"), e3.getMessage)
  }

  test("checkpoint preserves a foreign table's protocol and txn state") {
    import graft.destinations.DeltaWrite
    val table = tmpDir("delta-cp-proto")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one")))
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz","appendOnly"]}}""",
      metaLine, addLine("part=a/f1.parquet", "a"),
      """{"txn":{"appId":"stream-1","version":9}}"""))
    DeltaWrite.checkpoint(spark, table.toString)
    // drop the JSON commit: replay must now come from the checkpoint alone
    java.nio.file.Files.delete(table.resolve("_delta_log").resolve(f"${0L}%020d.json"))
    val snap = DeltaLog.snapshot(spark, table.toString)
    assert(snap.protocol.contains(DeltaLog.Protocol(3, 7,
      Set("timestampNtz"), Set("timestampNtz", "appendOnly"))))
    assert(snap.txns == Map("stream-1" -> 9L))
    assert(DeltaLog.read(spark, table.toString).count() == 1)
  }

  // ---- column mapping fixtures: files + partitionValues + stats all speak
  // physical names ("col-…"), the schema carries the renames in metadata

  private val mappedSchemaJson =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-id9"}},
      |{"name":"meta","type":{"type":"struct","fields":[
      |{"name":"a","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":3,"delta.columnMapping.physicalName":"col-na"}},
      |{"name":"b","type":"string","nullable":true,"metadata":{"delta.columnMapping.id":4,"delta.columnMapping.physicalName":"col-nb"}}]},"nullable":true,"metadata":{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-meta"}},
      |{"name":"part","type":"string","nullable":true,"metadata":{"delta.columnMapping.id":5,"delta.columnMapping.physicalName":"col-part"}}]}"""
      .stripMargin.replace("\n", "")

  private def mappedMetaLine: String =
    s"""{"metaData":{"id":"fixture-cm","schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(mappedSchemaJson)},"partitionColumns":["part"],"format":{"provider":"parquet"},"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"5"}}}"""

  private def mappedDataFile(
      table: java.nio.file.Path, rel: String, rows: Seq[(Long, Long, String)]): Unit = {
    import spark.implicits._
    val tmp = table.resolve("_tmp_write")
    rows.toDF("i", "na", "nb")
      .select(col("i").as("col-id9"),
        struct(col("na").as("col-na"), col("nb").as("col-nb")).as("col-meta"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.move(part, dest)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("column mapping: physical files read back under logical names, stats still skip") {
    val table = tmpDir("delta-cm-read")
    mappedDataFile(table, "f1.parquet", Seq((1L, 10L, "x"), (2L, 20L, "y")))
    mappedDataFile(table, "f2.parquet", Seq((100L, 30L, "z")))
    def add(path: String, mn: Long, mx: Long) =
      s"""{"add":{"path":"$path","partitionValues":{"col-part":"a"},"size":1,"modificationTime":1,"dataChange":true,"stats":"{\\"numRecords\\":2,\\"minValues\\":{\\"col-id9\\":$mn},\\"maxValues\\":{\\"col-id9\\":$mx},\\"nullCount\\":{\\"col-id9\\":0}}"}}"""
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      mappedMetaLine, add("f1.parquet", 1L, 2L), add("f2.parquet", 100L, 100L)))

    val df = DeltaLog.read(spark, table.toString)
    assert(df.columns.toSeq == Seq("id", "meta", "part"))
    val rows = df.orderBy("id")
      .selectExpr("id", "meta.a", "meta.b", "part").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    assert(rows == Seq((1L, 10L, "x", "a"), (2L, 20L, "y", "a"), (100L, 30L, "z", "a")))

    // stats skipping: the predicate speaks logical names, the stats
    // physical ones — only f1 may hold id < 5
    val skipped = DeltaLog.readWhere(spark, table.toString, "id < 5")
    val scanned = skipped.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        sc.relation.location.inputFiles.toSeq
    }.flatten
    assert(scanned.size == 1 && scanned.head.contains("f1.parquet"), scanned)
    assert(skipped.count() == 2)

    // writer path (r8): mode-name tables are writable — the append lands
    // physical-named data and reads back logically
    import spark.implicits._
    val incoming = Seq((5L, 1L, "q", "a")).toDF("id", "a", "b", "part")
      .selectExpr("id", "named_struct('a', a, 'b', b) AS meta", "part")
    graft.destinations.DeltaWrite.append(spark, table.toString, incoming)
    val after = DeltaLog.read(spark, table.toString)
      .selectExpr("id", "meta.a", "part").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(after == Seq((1L, 10L, "a"), (2L, 20L, "a"), (5L, 1L, "a"), (100L, 30L, "a")))
  }

  test("column mapping: a field missing its physicalName refuses by name") {
    val table = tmpDir("delta-cm-miss")
    mappedDataFile(table, "f1.parquet", Seq((1L, 10L, "x")))
    val badSchema = mappedSchemaJson.replace(
      """{"name":"id","type":"long","nullable":true,"metadata":{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-id9"}}""",
      """{"name":"id","type":"long","nullable":true,"metadata":{}}""")
    val badMeta =
      s"""{"metaData":{"id":"fixture-cm2","schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(badSchema)},"partitionColumns":["part"],"format":{"provider":"parquet"},"configuration":{"delta.columnMapping.mode":"name"}}}"""
    commit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      badMeta,
      """{"add":{"path":"f1.parquet","partitionValues":{"col-part":"a"},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val e = intercept[IllegalArgumentException](DeltaLog.snapshot(spark, table.toString))
    assert(e.getMessage.contains("physicalName") && e.getMessage.contains("id"), e.getMessage)
  }

  test("v2 checkpoint: JSON manifest + parquet sidecars seed the snapshot") {
    import spark.implicits._
    import graft.destinations.DeltaWrite
    val table = tmpDir("delta-v2cp").resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    DeltaWrite.append(spark, table, (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v").coalesce(1))
    DeltaWrite.append(spark, table, (11L to 20L).map(i => (i, s"b$i")).toDF("id", "v").coalesce(1))
    DeltaWrite.append(spark, table, (21L to 30L).map(i => (i, s"c$i")).toDF("id", "v").coalesce(1))
    val logDir = java.nio.file.Paths.get(table, "_delta_log")

    // hand-build a v2 checkpoint at version 3: newline-JSON manifest with
    // protocol/metaData/checkpointMetadata + two sidecar refs; the adds
    // live ONLY in the sidecar parquet files under _sidecars/
    val adds = DeltaLog.snapshot(spark, table).files
    assert(adds.size == 3)
    val sidecarDir = logDir.resolve("_sidecars")
    java.nio.file.Files.createDirectories(sidecarDir)
    def writeSidecar(name: String, slice: Seq[DeltaLog.AddFile]): Unit = {
      val tmp = tmpDir("v2cp-side").resolve(name)
      slice.toDF()
        .select(org.apache.spark.sql.functions.struct(
          col("path"), col("partitionValues"), col("size"),
          col("modificationTime"), col("stats")).as("add"))
        .repartition(1).write.parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      val part =
        try listing.filter(p => p.getFileName.toString.startsWith("part-"))
          .findFirst().get()
        finally listing.close()
      java.nio.file.Files.move(part, sidecarDir.resolve(name))
    }
    writeSidecar("s1.parquet", adds.take(2))
    writeSidecar("s2.parquet", adds.drop(2))
    val v0Lines = java.nio.file.Files.readAllLines(
      logDir.resolve(f"${0L}%020d.json"))
    val protoLine = v0Lines.stream.filter(_.contains("\"protocol\"")).findFirst().get()
    val metaLine0 = v0Lines.stream.filter(_.contains("\"metaData\"")).findFirst().get()
    val manifest = Seq(
      protoLine, metaLine0,
      """{"checkpointMetadata":{"version":3}}""",
      """{"sidecar":{"path":"s1.parquet","sizeInBytes":1}}""",
      """{"sidecar":{"path":"s2.parquet","sizeInBytes":1}}""")
    java.nio.file.Files.write(
      logDir.resolve(f"${3L}%020d.checkpoint.0aa1-b2.json"),
      manifest.mkString("\n").getBytes("UTF-8"))

    // metadata-cleanup the covered commits: only the v2 checkpoint can
    // seed the snapshot now
    (0L to 3L).foreach(v =>
      java.nio.file.Files.delete(logDir.resolve(f"$v%020d.json")))
    def ids() = DeltaLog.read(spark, table).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids() == (1L to 30L).toSet)
    // stats survive through the sidecar: a range predicate prunes files
    assert(DeltaLog.readWhere(spark, table, "id >= 25").collect()
      .map(_.getLong(0)).toSet == (25L to 30L).toSet)
    // the checkpoint-seeded table keeps accepting protocol commits
    DeltaWrite.append(spark, table, Seq((31L, "d31")).toDF("id", "v"))
    assert(ids() == (1L to 31L).toSet)
    DeltaWrite.delete(spark, table, "id <= 5")
    assert(ids() == (6L to 31L).toSet)

    // a table that formally DECLARES the v2Checkpoint feature stays both
    // readable AND writable (r11: the write half landed) — and its
    // checkpoints come out in v2 form, never classic (which the feature
    // forbids for conforming readers)
    java.nio.file.Files.write(logDir.resolve(f"${6L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""")
        .getBytes("UTF-8"))
    assert(ids() == (6L to 31L).toSet)
    DeltaWrite.append(spark, table, Seq((99L, "z")).toDF("id", "v"))
    assert(ids() == (6L to 31L).toSet + 99L)
    val cpv = DeltaWrite.checkpoint(spark, table)
    val names = {
      val l = java.nio.file.Files.list(logDir)
      try {
        val b = Seq.newBuilder[String]
        l.forEach(p => { b += p.getFileName.toString; () })
        b.result()
      } finally l.close()
    }
    assert(names.exists(n => n.matches(f"$cpv%020d\\.checkpoint\\.[^.]+\\.parquet")),
      s"expected a v2 UUID-named manifest, got: ${names.sorted.mkString(", ")}")
    assert(!names.contains(f"$cpv%020d.checkpoint.parquet"),
      "classic checkpoint written on a v2Checkpoint-feature table")
  }

  test("v2 checkpoint: JSON manifest with INLINE adds on a partitioned table") {
    // spec-legal alternative to sidecars: the NDJSON manifest itself
    // carries the add actions. JSON inference spells partitionValues as a
    // STRUCT (dynamic-key objects infer that way), which the reader must
    // normalize to the map shape — round-10 review: struct→map is not a
    // legal cast and this shape crashed addIndex
    val table = tmpDir("delta-v2cp-inline")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one")))
    dataFile(table, "part=b/f2.parquet", Seq((2L, "two")))
    commit(table, 0L, Seq(metaLine,
      addLine("part=a/f1.parquet", "a"), addLine("part=b/f2.parquet", "b")))
    val logDir = table.resolve("_delta_log")
    val manifest = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine,
      """{"checkpointMetadata":{"version":0}}""",
      addLine("part=a/f1.parquet", "a"),
      addLine("part=b/f2.parquet", "b"))
    java.nio.file.Files.write(
      logDir.resolve(f"${0L}%020d.checkpoint.11ab-cd.json"),
      manifest.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.delete(logDir.resolve(f"${0L}%020d.json"))
    val got = DeltaLog.read(spark, table.toString)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(got == Set((1L, "a"), (2L, "b")), got.toString)
  }

  test("non-Delta directories and unknown versions fail with clear errors") {
    val empty = tmpDir("delta-none")
    val e1 = intercept[IllegalArgumentException](DeltaLog.snapshot(spark, empty.toString))
    assert(e1.getMessage.contains("_delta_log"))
    val table = tmpDir("delta-v")
    dataFile(table, "part=a/f1.parquet", Seq((1L, "one")))
    commit(table, 0L, Seq(metaLine, addLine("part=a/f1.parquet", "a")))
    val e2 = intercept[IllegalArgumentException](
      DeltaLog.snapshot(spark, table.toString, versionAsOf = Some(7L)))
    assert(e2.getMessage.contains("version 7"))
  }
}
