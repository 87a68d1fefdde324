package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShims, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => LegacyOffset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.IcebergRead

import scala.jdk.CollectionConverters._

/** Continuous (tailing) Structured Streaming source over an Apache
  * Iceberg v2 table — `spark.readStream.format("graft-iceberg")
  * .load(tablePath)`. The cross-format complement of the `graft-delta`
  * tail: stream OUT of an Iceberg lake into anything (e.g. a Delta table
  * via [[Streams.deltaAppendSink]]).
  *
  * Semantics (Iceberg's own Spark streaming-read behavior):
  *  - **Initial snapshot**: the first batch is the table's live state at
  *    stream creation (all deletes applied), pinned by SNAPSHOT ID in
  *    the offset — a crash-replayed first batch reads the ORIGINAL
  *    snapshot's file set even after the table advanced — but projected
  *    under the table's CURRENT schema (what the source declared), so a
  *    schema evolved between the last data snapshot and stream start
  *    cannot fail the output-attribute match.
  *  - **Incremental tailing**: each later `append` snapshot contributes
  *    exactly the data files it ADDED (entry status 1, matching snapshot
  *    id), one batch per trigger window. `replace` snapshots
  *    ([[graft.destinations.IcebergWrite.rewriteDataFiles]] compactions)
  *    are passed over silently — a rewrite changes layout, not rows.
  *  - **Changed/removed data**: `delete` / `overwrite` snapshots cannot
  *    be represented in an append-only stream; by default the stream
  *    fails loudly at that snapshot. `skipDeleteSnapshots` /
  *    `skipOverwriteSnapshots` (Iceberg's `streaming-skip-*-snapshots`
  *    options) skip them wholesale.
  *  - **Rate limiting**: `maxSnapshotsPerTrigger` caps how many new
  *    snapshots a micro-batch may span (admission is snapshot-granular —
  *    an append's files are indivisible).
  *
  * Offsets are `{sequence, snapshotId, initial}` — pure metadata-derived,
  * so any (start, end] batch replays from the checkpoint with no
  * source-side state. Completeness of a replayed range is PROVEN by
  * walking snapshot parent pointers from the end offset back to the
  * start offset's snapshot id: a broken link means a mid-range snapshot
  * expired under the checkpoint (refused loudly instead of silently
  * dropping a batch). The spec only guarantees MONOTONIC sequence
  * numbers — foreign writers may leave gaps — so the chain, not
  * sequence density, is the integrity witness; keep snapshot retention
  * past the checkpoint recovery horizon, as with any Iceberg streaming
  * consumer.
  *
  * Scale: offset arithmetic reads table metadata only (snapshot-array
  * bounded); batch reads plan exactly like [[IcebergRead.read]] — data
  * files scan on executors, the incremental mode applies no deletes and
  * touches only the one snapshot's added manifests.
  */
final class IcebergTailSource(
    spark: SparkSession,
    tablePath: String,
    maxSnapshotsPerTrigger: Option[Int],
    skipDeleteSnapshots: Boolean,
    skipOverwriteSnapshots: Boolean) extends Source {

  import IcebergTailSource._

  private val schema0 = IcebergRead.tableSchema(spark, tablePath)
  override def schema: StructType = schema0

  /** (sequence, snapshotId, operation, parentId) ascending by sequence —
    * re-read from metadata each call so new commits become visible. */
  private def snapshotsAsc(): IndexedSeq[(Long, Long, String, Option[Long])] = {
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    val md = IcebergRead.currentMetadata(
      fs, new Path(fs.makeQualified(table), "metadata"))
    md.get("snapshots").elements().asScala.map { s =>
      val seq = Option(s.get("sequence-number")).map(_.asLong()).getOrElse(0L)
      val op = Option(s.get("summary")).filterNot(_.isNull)
        .flatMap(n => Option(n.get("operation")).filterNot(_.isNull))
        .map(_.asText()).getOrElse("append")
      val parent = Option(s.get("parent-snapshot-id")).filterNot(_.isNull)
        .map(_.asLong())
      (seq, s.get("snapshot-id").asLong(), op, parent)
    }.toIndexedSeq.sortBy(_._1)
  }

  // the stream's initial snapshot, fixed at creation (None = empty table:
  // every snapshot arrives as a tail batch)
  private val startSnapshot: Option[(Long, Long)] =
    snapshotsAsc().lastOption.map(t => (t._1, t._2))

  private var lastPlanned: Option[Pos] = None

  override def getOffset: Option[LegacyOffset] = {
    val next: Option[Pos] = lastPlanned match {
      case None if startSnapshot.isDefined =>
        // ALWAYS plan the initial snapshot alone first: the (None, end]
        // batch stays pinned to end's snapshot id across restarts
        startSnapshot.map { case (seq, id) => Pos(seq, id, initial = true) }
      case base =>
        val all = snapshotsAsc()
        val fromSeq = base.map(_.seq).getOrElse(0L)
        val newer = all.filter(_._1 > fromSeq)
        val step = newer.take(maxSnapshotsPerTrigger.getOrElse(newer.size))
        if (step.isEmpty) base
        else Some(Pos(step.last._1, step.last._2, initial = false))
    }
    lastPlanned = next
    next.map(IcebergTailOffset.apply)
  }

  /** The (startId, to.id] snapshot range, proven COMPLETE by walking
    * parent pointers back from `to.id`: every link in the chain must
    * still be in the metadata until `startId` (or the root, for a stream
    * that began on an empty table) is reached. Unlike the previous
    * dense-sequence-number check this tolerates foreign writers that
    * legally leave sequence gaps (failed-commit allocations, rollbacks) —
    * the spec only promises monotonic sequences — while still failing
    * loudly when a mid-range snapshot genuinely expired under the
    * checkpoint.
    */
  private def chainRange(
      toId: Long, startId: Option[Long]): Seq[(Long, String)] = {
    val byId = snapshotsAsc().map(t => t._2 -> t).toMap
    var acc = List.empty[(Long, String)]
    var cur: Option[Long] = Some(toId)
    while (cur.isDefined && !startId.contains(cur.get)) {
      val id = cur.get
      val (_, _, op, parent) = byId.getOrElse(id,
        throw new IllegalStateException(
          s"snapshot $id in the offset range of $tablePath is no longer " +
            "in the metadata (expired under the stream) — full refresh " +
            "required"))
      acc = (id, op) :: acc
      cur = parent
      if (cur.isEmpty && startId.isDefined) throw new IllegalStateException(
        s"snapshot chain of $tablePath from $toId reached the root " +
          s"without meeting stream offset ${startId.get} — the branch was " +
          "rolled back or rewritten under the stream; full refresh required")
    }
    acc
  }

  /** Conform `df` to the stream's declared schema: evolved-in columns the
    * declaration predates are dropped, declared columns a batch lacks are
    * null-filled, types cast. Keeps MicroBatchExecution's output-attribute
    * match intact across mid-stream schema evolution (a restart picks up
    * the new schema).
    */
  private def alignToDeclared(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val present = df.columns.toSet
    df.select(schema0.fields.toIndexedSeq.map { f =>
      val q = s"`${f.name.replace("`", "``")}`"
      (if (present(f.name)) col(q).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
  }

  override def getBatch(start: Option[LegacyOffset], end: LegacyOffset): DataFrame = {
    val to = parsePos(end)
    lastPlanned = Some(to)
    val pieces = Seq.newBuilder[DataFrame]
    val startPos = start.map(parsePos)
    val fromSeq: Long = startPos match {
      case Some(p) => p.seq
      case None if to.initial =>
        // first / replayed initial batch: the full row state AT THAT
        // snapshot (pinned file set), projected under the CURRENT schema —
        // the source's declared schema is the table's live schema, so a
        // snapshot written under an older schema-id must still surface
        // with today's column set (Iceberg's own streaming-read behavior)
        pieces += IcebergRead.read(spark, tablePath,
          IcebergRead.Options(snapshotId = Some(to.id),
            projectCurrentSchema = true))
        to.seq
      case None => 0L // table was empty at stream creation
    }
    if (!to.initial || fromSeq < to.seq) {
      chainRange(to.id, startPos.map(_.id)).foreach { case (id, op) =>
        op match {
          case "append" =>
            pieces += IcebergRead.read(spark, tablePath, IcebergRead.Options(
              snapshotId = Some(id), addedInSnapshotId = Some(id),
              projectCurrentSchema = true))
          case "replace" => () // layout-only compaction: rows unchanged
          case "delete" =>
            if (!skipDeleteSnapshots) throw new IllegalStateException(
              s"snapshot $id of $tablePath deletes rows, which an " +
                "append-only stream cannot represent; set " +
                "skipDeleteSnapshots=true to pass over it")
          case "overwrite" =>
            if (!skipOverwriteSnapshots) throw new IllegalStateException(
              s"snapshot $id of $tablePath overwrites rows; set " +
                "skipOverwriteSnapshots=true to pass over it")
          case other => throw new IllegalStateException(
            s"cannot stream operation '$other' (snapshot $id of $tablePath)")
        }
      }
    }
    val ps = pieces.result()
    val batch =
      if (ps.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema0)
      else alignToDeclared(ps.reduce(_ unionByName _))
    GraftShims.asStreamingDataFrame(spark, batch)
  }

  override def commit(end: LegacyOffset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"IcebergTailSource[$tablePath]"
}

object IcebergTailSource {

  private val mapper = new ObjectMapper()

  final case class Pos(seq: Long, id: Long, initial: Boolean)

  final case class IcebergTailOffset(pos: Pos) extends LegacyOffset {
    override def json(): String =
      s"""{"sequence":${pos.seq},"snapshotId":${pos.id},"initial":${pos.initial}}"""
  }

  private[streaming] def parsePos(o: AnyRef): Pos = o match {
    case IcebergTailOffset(p) => p
    case other =>
      val json = other match {
        case l: LegacyOffset => l.json()
        case s: String => s
      }
      val n = mapper.readTree(json)
      Pos(n.get("sequence").asLong(), n.get("snapshotId").asLong(),
        n.get("initial").asBoolean())
  }
}

final class IcebergTailSourceProvider extends StreamSourceProvider
  with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-iceberg source requires a table path: .load(tablePath)"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      IcebergRead.tableSchema(sqlContext.sparkSession, path(parameters))))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergTailSource(
      sqlContext.sparkSession,
      path(parameters),
      parameters.get("maxSnapshotsPerTrigger").map(_.toInt),
      parameters.get("skipDeleteSnapshots").exists(_.equalsIgnoreCase("true")),
      parameters.get("skipOverwriteSnapshots").exists(_.equalsIgnoreCase("true")))
}
