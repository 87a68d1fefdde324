package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.sources.DeltaLog

/** Continuous (tailing) Structured Streaming source over a Delta table —
  * `spark.readStream.format("graft-delta").load(tablePath)`.
  *
  * Semantics (delta-spark's Delta source, public behavior):
  *  - **Initial snapshot**: the stream starts from the table's live state
  *    at stream creation — every live file, in deterministic (sorted-path)
  *    order — then tails commits beyond that version. `startingVersion`
  *    skips the snapshot and begins incremental replay at the given
  *    version (0 = from table creation; "latest" = new commits only).
  *  - **Incremental tailing**: each later commit contributes its
  *    `dataChange = true` adds, in log order. Layout-only commits
  *    (OPTIMIZE's dataChange=false rearranges, metadata, protocol, vacuum
  *    audits, checksums) are passed over silently — a compaction must be
  *    invisible to the stream.
  *  - **Changed/removed data**: a commit that REMOVES data (delete,
  *    update, overwrite) cannot be represented in an append-only stream;
  *    by default the stream fails loudly at that version. With
  *    `skipChangeCommits = true` the whole commit is skipped (the
  *    delta-spark option of the same name).
  *  - **Change-feed mode** (`readChangeFeed = true`, CDF-enabled tables):
  *    the stream carries CHANGE rows (`_change_type` /
  *    `_commit_version` / `_commit_timestamp`) instead of table rows —
  *    each commit's changes via [[DeltaLog.readCdf]], commit-granular
  *    admission (a commit's changes are indivisible). By default the
  *    stream STARTS WITH THE INITIAL SNAPSHOT synthesized as `insert`
  *    rows at the snapshot's version/timestamp (delta-spark's behavior;
  *    file-granular admission applies to that span), then tails changes;
  *    `startingVersion` skips the snapshot and replays changes from the
  *    given version.
  *  - **Rate limiting**: `maxFilesPerTrigger` caps the files admitted per
  *    micro-batch ([[SupportsAdmissionControl]]); one batch may span
  *    multiple commits. With `Trigger.AvailableNow`
  *    ([[SupportsTriggerAvailableNow]]) the stream drains everything up
  *    to the prepare-time latest version in rate-limited batches, then
  *    stops — offsets are durable in the query checkpoint, so the next
  *    run resumes exactly where this one stopped, even mid-log.
  *
  * Offsets are `{tableVersion, fileIndex, isInitialSnapshot}` — the count
  * of files already delivered within a version, delta-spark's
  * DeltaSourceOffset shape — so a batch is a pure log-derived function of
  * (start, end]: replayable from the checkpoint with no source-side state.
  *
  * Scale: offset arithmetic parses only the commit JSONs in the tail
  * window (driver-side, bounded by commits-per-trigger, never table
  * size). The initial snapshot materializes the live-file list once
  * (manifest-bounded, the same list any full read plans over) and serves
  * slices of it; data files are only ever read on executors via
  * [[DeltaLog.readFiles]] — deletion vectors, column mapping and type
  * widening all apply, so a merge-on-read snapshot streams its LIVE rows
  * only. The read schema is pinned at stream start (additive evolution
  * upstream null-fills; delta-spark likewise fixes the schema per run).
  */
final class DeltaTailSource(
    spark: SparkSession,
    tablePath: String,
    metadataPath: String,
    maxFilesPerTrigger: Option[Int],
    maxBytesPerTrigger: Option[Long],
    skipChangeCommits: Boolean,
    startingVersion: Option[String],
    startingTimestamp: Option[String],
    readChangeFeed: Boolean) extends Source
  with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  import DeltaTailSource._

  // pinned at stream start: schema/protocol context for every batch read
  // (requireReadable gates unsupported reader features here, once)
  private val startSnap = DeltaLog.snapshot(spark, tablePath)

  if (readChangeFeed)
    require(startSnap.configuration.get("delta.enableChangeDataFeed")
        .exists(_.equalsIgnoreCase("true")),
      s"readChangeFeed requires delta.enableChangeDataFeed on $tablePath")

  /** Initial-snapshot file lists keyed by SNAPSHOT VERSION, sorted for
    * deterministic slicing. The common case is the stream-creation
    * snapshot; a REPLAYED offset (crash recovery with an uncommitted
    * initial-snapshot batch) pins the ORIGINAL snapshot version, and the
    * table may have advanced while the stream was down — serving that
    * span from the creation-time snapshot would silently return a
    * different (or empty) file list. Time-travel back to the offset's
    * version instead, exactly as delta-spark's DeltaSource does.
    */
  private val snapCache =
    scala.collection.concurrent.TrieMap.empty[Long, IndexedSeq[DeltaLog.AddFile]]
  private def snapshotFilesAt(version: Long): IndexedSeq[DeltaLog.AddFile] =
    snapCache.getOrElseUpdate(version,
      (if (version == startSnap.version) startSnap
       else DeltaLog.snapshot(spark, tablePath, versionAsOf = Some(version)))
        .files.sortBy(_.path).toIndexedSeq)

  private def computeStartPos(): Pos = (startingVersion, startingTimestamp) match {
    case (Some(_), Some(_)) => throw new IllegalArgumentException(
      "startingVersion and startingTimestamp cannot both be set")
    // earliest version committed at-or-after the timestamp (delta-spark
    // semantics: a commit AT the timestamp is included); one past the
    // last commit ⇒ new commits only, before the first ⇒ from the start
    case (None, Some(ts)) =>
      Pos(DeltaLog.earliestVersionAtOrAfter(spark, tablePath, parseTs(spark, ts)),
        0, initial = false)
    // with or without readChangeFeed, the default start is the initial
    // snapshot (CDF synthesizes it as insert rows — delta-spark behavior)
    case (None, None) => Pos(startSnap.version, 0, initial = true)
    case (Some("latest"), _) => Pos(startSnap.version + 1, 0, initial = false)
    case (Some(v), _) => Pos(v.toLong, 0, initial = false)
  }

  /** The start position is DURABLE in the query's metadata directory: the
    * default start is "snapshot at stream creation", which is a function
    * of wall-clock, so a restarted query must recover the ORIGINAL
    * resolved position (getBatch(None, end) replays from it) rather than
    * re-resolving against the advanced table.
    */
  private val startPos: Pos = {
    val marker = new Path(metadataPath, "graft-start")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      parsePos(content)
    } else {
      val pos = computeStartPos()
      try {
        val out = fs.create(marker, false)
        try out.write(DeltaTailOffset(pos).json().getBytes("UTF-8"))
        finally out.close()
        pos
      } catch {
        // lost the create race against a concurrent restart: theirs wins
        case _: java.io.IOException if fs.exists(marker) =>
          val in = fs.open(marker)
          val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          parsePos(content)
      }
    }
  }

  /** Position already delivered to the engine (end of the last planned
    * batch); recovered from the engine's offsets on restart. */
  @volatile private var lastPlanned: Option[Pos] = None
  @volatile private var availableNowCap: Option[Long] = None

  override def schema: StructType =
    if (!readChangeFeed) startSnap.schema
    else StructType(startSnap.schema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType),
      StructField("_commit_timestamp", TimestampType)))

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(DeltaLog.lazySnapshot(spark, tablePath).meta.version)

  /** Commit `v`'s authoritative timestamp (ICT when present, file mtime
    * otherwise) — stamps synthesized snapshot-as-insert CDF rows.
    */
  private def commitTimeOf(v: Long): Long = {
    val p = new Path(new Path(tablePath, "_delta_log"), f"$v%020d.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // checkpoint-cleaned commit: epoch 0 keeps replays deterministic
    // (the version column still identifies the snapshot)
    try DeltaLog.commitTimestampOf(fs, fs.getFileStatus(p))
    catch { case _: java.io.FileNotFoundException => 0L }
  }

  // --------------------------------------------------------- offset planning

  /** The adds of commit `v` that an append-only tail delivers, in log
    * order — or None when the whole commit is passed over (layout-only,
    * or data-changing under skipChangeCommits).
    */
  private def commitAdds(v: Long): IndexedSeq[DeltaLog.AddFile] = {
    val (adds, removesData) = parseCommit(spark, tablePath, v)
    if (!removesData) adds
    else if (skipChangeCommits) IndexedSeq.empty
    else throw new IllegalStateException(
      s"version $v of $tablePath changed or removed existing data, which an " +
        "append-only stream cannot represent; set skipChangeCommits=true to " +
        "pass over such commits")
  }

  /** Walk forward from `from`, admitting up to `budget` files, never past
    * version `cap`. Pure function of the log, with positions normalized
    * (an exhausted version advances to `(v+1, 0)`) — latestOffset plans
    * with a budget, getBatch re-walks the same span with the end offset as
    * the wall, so both always derive identical file sets.
    */
  private def advance(from: Pos, budget: Int, byteBudget: Long, cap: Long): Pos = {
    // CDF mode: the initial-snapshot span is FILE-granular (synthesized
    // inserts slice like any snapshot read); the tail is COMMIT-granular —
    // a commit's change rows are indivisible, so the budget counts commits
    // there (maxFilesPerTrigger caps the trigger's commit span)
    if (readChangeFeed) {
      var pos = from
      var left = budget
      var moved = true
      while (left > 0 && moved) {
        moved = false
        if (pos.initial) {
          val files = snapshotFilesAt(pos.version)
          val take = math.min(left, files.size - pos.index)
          if (take > 0) { pos = pos.copy(index = pos.index + take); left -= take }
          if (pos.index >= files.size) pos = Pos(pos.version + 1, 0, initial = false)
          moved = true
        } else if (pos.version <= cap) {
          val take = math.min(left.toLong, cap + 1 - pos.version).toInt
          pos = Pos(pos.version + take, 0, initial = false)
          left -= take
          moved = take > 0
        }
      }
      return pos
    }
    var pos = from
    var left = budget
    var bytesLeft = byteBudget
    var admitted = 0
    var moved = true
    // admit files one at a time so the byte budget can stop mid-version;
    // like delta-spark, at least ONE file is always admitted per batch
    // even when it alone exceeds maxBytesPerTrigger
    def admit(files: IndexedSeq[DeltaLog.AddFile]): Unit = {
      while (pos.index < files.size && left > 0 &&
          (bytesLeft > 0 || admitted == 0)) {
        bytesLeft -= files(pos.index).size
        pos = pos.copy(index = pos.index + 1)
        left -= 1
        admitted += 1
      }
    }
    while (left > 0 && (bytesLeft > 0 || admitted == 0) && moved) {
      moved = false
      if (pos.initial) {
        val snapFiles = snapshotFilesAt(pos.version)
        admit(snapFiles)
        if (pos.index >= snapFiles.size)
          pos = Pos(pos.version + 1, 0, initial = false)
        moved = true
      } else if (pos.version <= cap) {
        val adds = commitAdds(pos.version)
        admit(adds)
        if (pos.index >= adds.size) pos = Pos(pos.version + 1, 0, initial = false)
        moved = true
      }
    }
    pos
  }

  override def latestOffset(start: ConnectorOffset, limit: ReadLimit): ConnectorOffset = {
    val from = Option(start).map(parsePos)
      .orElse(lastPlanned).getOrElse(startPos)
    def flat(l: ReadLimit): Seq[ReadLimit] = l match {
      case c: CompositeReadLimit => c.getReadLimits.toSeq
      case one => Seq(one)
    }
    val budget = flat(limit).collectFirst {
      case f: ReadMaxFiles => f.maxFiles()
    }.getOrElse(Int.MaxValue)
    val byteBudget = flat(limit).collectFirst {
      case b: ReadMaxBytes => b.maxBytes()
    }.getOrElse(Long.MaxValue)
    val cap = availableNowCap
      .getOrElse(DeltaLog.lazySnapshot(spark, tablePath).meta.version)
    // an unchanged position round-trips as an identical offset, which the
    // engine reads as "no new batch"
    val end = advance(from, budget, byteBudget, cap)
    lastPlanned = Some(end)
    DeltaTailOffset(end)
  }

  override def reportLatestOffset(): ConnectorOffset = {
    val cap = DeltaLog.lazySnapshot(spark, tablePath).meta.version
    val from = lastPlanned.getOrElse(startPos)
    DeltaTailOffset(advance(from, Int.MaxValue, Long.MaxValue, cap))
  }

  override def getOffset: Option[LegacyOffset] =
    Option(latestOffset(lastPlanned.map(DeltaTailOffset.apply).orNull,
      getDefaultReadLimit)).map(o => o.asInstanceOf[LegacyOffset])

  // ------------------------------------------------------------- batch build

  override def getBatch(start: Option[LegacyOffset], end: LegacyOffset): DataFrame = {
    val from = start.map(parsePos).getOrElse(startPos)
    val to = parsePos(end)
    if (readChangeFeed) {
      lastPlanned = Some(to)
      import org.apache.spark.sql.functions.{col, lit}
      val pieces = Seq.newBuilder[DataFrame]
      var pos = from
      // initial-snapshot span: live rows synthesized as insert changes at
      // the snapshot's version/timestamp (delta-spark's CDF stream start)
      if (pos.initial && pos != to) {
        val files = snapshotFilesAt(pos.version)
        val upper =
          if (to.initial && to.version == pos.version) to.index else files.size
        val slice = files.slice(pos.index, upper)
        if (slice.nonEmpty)
          pieces += DeltaLog.readFiles(spark, tablePath, startSnap, slice)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(pos.version))
            .withColumn("_commit_timestamp",
              lit(new java.sql.Timestamp(commitTimeOf(pos.version))))
        pos =
          if (to.initial && to.version == pos.version) to
          else Pos(pos.version + 1, 0, initial = false)
      }
      if (!pos.initial && !to.initial && to.version > pos.version)
        pieces += DeltaLog.readCdf(spark, tablePath,
          pos.version - 1, Some(to.version - 1))
      val cols = schema.fieldNames.toIndexedSeq.map(col)
      val batch = pieces.result() match {
        case Seq() => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        case ps => ps.map(_.select(cols: _*)).reduce(_ unionByName _)
      }
      return GraftShims.asStreamingDataFrame(spark, batch)
    }
    val files = IndexedSeq.newBuilder[DeltaLog.AddFile]
    // re-walk the exact span: budget unbounded, wall = end position
    var pos = from
    while (pos != to && (pos.version < to.version ||
        (pos.version == to.version && pos.index < to.index))) {
      val adds: IndexedSeq[DeltaLog.AddFile] =
        if (pos.initial) snapshotFilesAt(pos.version) else commitAdds(pos.version)
      val upper =
        if (pos.version == to.version && pos.initial == to.initial) to.index
        else adds.size
      files ++= adds.slice(pos.index, upper)
      pos =
        if (upper >= adds.size && !(pos.version == to.version && pos.initial == to.initial))
          Pos(pos.version + 1, 0, initial = false)
        else pos.copy(index = upper)
    }
    lastPlanned = Some(to)
    val batch = DeltaLog.readFiles(spark, tablePath, startSnap, files.result())
    GraftShims.asStreamingDataFrame(spark, batch)
  }

  override def commit(end: ConnectorOffset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"DeltaTailSource[$tablePath]"
}

object DeltaTailSource {

  /** Stream position: `index` files of `version` already delivered.
    * `initial = true` while slicing the stream-start snapshot (whose
    * version the position carries); the first incremental version is
    * `snapshotVersion + 1`.
    */
  final case class Pos(version: Long, index: Int, initial: Boolean) {
    def pastAll(cap: Long): Boolean = !initial && version > cap
  }

  final case class DeltaTailOffset(pos: Pos) extends LegacyOffset {
    override def json(): String =
      s"""{"tableVersion":${pos.version},"fileIndex":${pos.index},""" +
        s""""isInitialSnapshot":${pos.initial}}"""
  }

  private val mapper = new ObjectMapper()

  /** Parse a user-supplied `startingTimestamp`: ISO instants with an
    * explicit offset (`...Z`, `...+02:00`) are honored as spelled;
    * offset-less date-times and date-only strings resolve in the SESSION
    * timezone (the SQL convention for timestamp literals). A space
    * separator is accepted alongside `T`.
    */
  private[streaming] def parseTs(spark: SparkSession, s: String): java.time.Instant = {
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    val t = s.trim.replace(' ', 'T')
    try java.time.OffsetDateTime.parse(t).toInstant
    catch { case _: java.time.format.DateTimeParseException =>
      try java.time.LocalDateTime.parse(t).atZone(zone).toInstant
      catch { case _: java.time.format.DateTimeParseException =>
        java.time.LocalDate.parse(t).atStartOfDay(zone).toInstant } }
  }

  private[streaming] def parsePos(o: AnyRef): Pos = o match {
    case DeltaTailOffset(p) => p
    case other =>
      val json = other match {
        case c: ConnectorOffset => c.json()
        case s: String => s
      }
      val n = mapper.readTree(json)
      Pos(n.get("tableVersion").asLong(), n.get("fileIndex").asInt(),
        n.get("isInitialSnapshot").asBoolean())
  }

  /** Parse commit `v`: (dataChange adds in log order, whether the commit
    * removed changed data). Refuses when the commit JSON is gone
    * (checkpoint-cleaned) — the tail cannot be reconstructed and the
    * consumer must full-refresh, same contract as
    * [[DeltaLog.readChanges]].
    */
  private def parseCommit(spark: SparkSession, tablePath: String,
      v: Long): (IndexedSeq[DeltaLog.AddFile], Boolean) = {
    val p = new Path(new Path(tablePath, "_delta_log"), f"$v%020d.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"commit $v no longer in _delta_log of $tablePath (checkpoint-" +
        "cleaned); streaming tail impossible — restart from a fresh snapshot")
    val in = fs.open(p)
    val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val adds = IndexedSeq.newBuilder[DeltaLog.AddFile]
    var removesData = false
    content.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
      val n = mapper.readTree(line)
      Option(n.get("add")).filterNot(_.isNull).foreach { a =>
        if (Option(a.get("dataChange")).forall(_.asBoolean(true)))
          adds += DeltaLog.parseAddAction(a)
      }
      Option(n.get("remove")).filterNot(_.isNull).foreach { r =>
        if (Option(r.get("dataChange")).forall(_.asBoolean(true)))
          removesData = true
      }
    }
    (adds.result(), removesData)
  }
}

/** Streaming SINK half of `format("graft-delta")`: every micro-batch
  * becomes one Delta append commit. With a `txnAppId` option each commit
  * carries a SetTransaction keyed on the batch id, so a batch that landed
  * in Delta but crashed before the engine's offset commit is SKIPPED on
  * replay — exactly-once end-to-end (the delta-spark sink discipline;
  * without the option delivery is at-least-once on crash replay).
  * Appends are BLIND commits, so concurrent writers rebase underneath
  * ([[graft.destinations.Concurrency]]) — many streams can feed one table.
  * Only Append output mode is supported: Delta's log has no in-place
  * update shape for Complete/Update modes (run aggregations with
  * foreachBatch + upsert instead).
  */
final class DeltaTailSink(
    tablePath: String,
    txnAppId: Option[String]) extends org.apache.spark.sql.execution.streaming.Sink {
  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    val spark = data.sparkSession
    // the incoming frame is the engine's streaming relation — re-plan it
    // as a batch frame before handing it to the batch writer
    val batch = GraftShims.asBatchDataFrame(spark, data)
    txnAppId match {
      case Some(app) =>
        val applied = DeltaLog.lazySnapshot(spark, tablePath)
          .meta.txns.getOrElse(app, -1L)
        if (batchId > applied)
          graft.destinations.DeltaWrite.append(spark, tablePath, batch,
            txn = Some((app, batchId))): Unit
      case None =>
        graft.destinations.DeltaWrite.append(spark, tablePath, batch): Unit
    }
  }
  override def toString: String = s"DeltaTailSink[$tablePath]"
}

/** `format("graft-delta")` registration. The table path arrives as the
  * `path` option (`.load(tablePath)`); `maxFilesPerTrigger`,
  * `skipChangeCommits` and `startingVersion` ride alongside.
  */
final class DeltaTailSourceProvider extends StreamSourceProvider with DataSourceRegister
  with org.apache.spark.sql.sources.StreamSinkProvider {

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-delta sink supports Append output mode only, got $outputMode")
    require(partitionColumns.isEmpty,
      "graft-delta sink writes to an EXISTING Delta table, whose partitioning " +
        "is fixed at create — partitionBy on the stream is not supported")
    new DeltaTailSink(path(parameters), parameters.get("txnAppId"))
  }

  override def shortName(): String = "graft-delta"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-delta source requires a table path: .load(tablePath)"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val base = DeltaLog.snapshot(sqlContext.sparkSession, path(parameters)).schema
      if (parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true")))
        StructType(base.fields ++ Seq(
          StructField("_change_type", StringType),
          StructField("_commit_version", LongType),
          StructField("_commit_timestamp", TimestampType)))
      else base
    })

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaTailSource(
      sqlContext.sparkSession,
      path(parameters),
      metadataPath,
      parameters.get("maxFilesPerTrigger").map(_.toInt),
      parameters.get("maxBytesPerTrigger").map(_.toLong),
      parameters.get("skipChangeCommits").exists(_.equalsIgnoreCase("true")),
      parameters.get("startingVersion").map(_.trim).filter(_.nonEmpty),
      parameters.get("startingTimestamp").map(_.trim).filter(_.nonEmpty),
      parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true")))
}
