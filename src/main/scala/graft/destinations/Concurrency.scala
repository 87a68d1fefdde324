package graft.destinations

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Optimistic concurrency for the Delta writer (public protocol semantics,
  * delta-spark's WriteSerializable conflict rules; capability class of
  * delta-rs commit-conflict resolution — the reference delegates commits at
  * aqueducts/delta/src/lib.rs:177-328).
  *
  * A writer that loses the commit race (another writer claimed its version
  * file) does NOT have to fail: the losing transaction re-reads the commits
  * that won, classifies the overlap, and — when the winners are logically
  * disjoint from what it read and wrote — REBASES: re-publishes the same
  * adds/removes at the next free version. Only true semantic overlap
  * (same files removed twice, a rewrite racing a whole-table read, a
  * metadata/protocol change under anyone's feet) aborts, loudly, with the
  * conflict named.
  *
  * Scale note: classification reads only the commit files in the race
  * window (attempted..latest) — driver-side, bounded by the number of
  * concurrent winners, never by table size.
  */
object Concurrency {

  /** Thrown by the physical publish when another writer claimed the
    * version file. Extends IllegalStateException so pre-existing retry
    * paths (identity-append restart) keep working unchanged.
    */
  final class ConcurrentCommitException(msg: String)
    extends IllegalStateException(msg)

  /** A lost race that CANNOT be rebased — true semantic overlap with the
    * winning commit(s). The message names the conflict class and the
    * overlapping files/domains, delta-spark-style.
    */
  final class ConflictException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

  /** What the failed transaction READ — the half of the conflict rule the
    * commit actions alone cannot carry.
    */
  sealed trait ReadScope
  object ReadScope {
    /** Blind append: read nothing. Rebases over any data commit; only
      * metadata/protocol/txn/domain overlap aborts. */
    case object Blind extends ReadScope

    /** Read exactly these log paths (OPTIMIZE, stats backfill): aborts
      * only when a winner removed one of them (or one of ours — checked
      * independently); winners' adds never overlap a closed file set. */
    final case class Files(paths: Set[String]) extends ReadScope

    /** Whole-table read (MERGE / DELETE / overwrite): a winner's REWRITE
      * (remove+add) conflicts — its post-images are rows this transaction
      * should have read. A winner's blind append is the documented
      * WriteSerializable anomaly and rebases cleanly; under
      * `delta.isolationLevel = Serializable` it aborts too. */
    case object Table extends ReadScope

    /** RESTORE-style: the commit is a diff against a fixed observed state,
      * so ANY winner data change (add or remove, dataChange or not)
      * invalidates it. */
    case object Exclusive extends ReadScope

    /** Audit bookkeeping (VACUUM START/END): carries no data actions and
      * stays truthful whatever else commits — rebases over everything
      * except a protocol change. */
    case object Audit extends ReadScope
  }

  /** The conflict-relevant content of one winning commit. `removes` is
    * every removed path (file-identity conflicts: delete-delete, re-add
    * resurrection); `dataChangeRemoves` only the dataChange=true subset —
    * a rearrange (OPTIMIZE) remove moves rows without changing them, so it
    * never invalidates a whole-table READ, only file-identity decisions.
    */
  final case class WinnerSummary(
      version: Long,
      operation: String,
      hasProtocol: Boolean,
      hasMetadata: Boolean,
      blindAdds: Set[String],
      rewriteAdds: Set[String],
      removes: Set[String],
      dataChangeRemoves: Set[String],
      txnAppIds: Set[String],
      domains: Set[String])

  private val mapper = new ObjectMapper()

  /** Parse the commits that won the race, versions `from..to` inclusive.
    * Paths come back exactly as spelled in the log (encoded), matching the
    * remove paths the losing transaction carries.
    */
  def summarize(
      spark: SparkSession, table: Path, from: Long, to: Long): Seq[WinnerSummary] = {
    val fs = table.getFileSystem(spark.sessionState.newHadoopConf())
    (from to to).map { v =>
      val p = new Path(new Path(table, "_delta_log"), f"$v%020d.json")
      val in = fs.open(p)
      val content = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      var hasProtocol = false
      var hasMetadata = false
      var op = ""
      var blindInfo: Option[Boolean] = None
      val adds = Set.newBuilder[String]
      val removes = Set.newBuilder[String]
      val dcRemoves = Set.newBuilder[String]
      val txns = Set.newBuilder[String]
      val domains = Set.newBuilder[String]
      var hasRemoves = false
      content.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("protocol")) hasProtocol = true
        if (n.has("metaData")) hasMetadata = true
        Option(n.get("commitInfo")).foreach { ci =>
          Option(ci.get("operation")).foreach(o => op = o.asText)
          Option(ci.get("isBlindAppend")).filterNot(_.isNull)
            .foreach(b => blindInfo = Some(b.asBoolean()))
        }
        Option(n.get("add")).foreach { a =>
          // dataChange=false adds are rearranged bytes, not new rows — they
          // never conflict as "appends" (their removes still conflict)
          if (Option(a.get("dataChange")).forall(_.asBoolean(true)))
            adds += a.get("path").asText
        }
        Option(n.get("remove")).foreach { r =>
          hasRemoves = true
          val p = r.get("path").asText
          removes += p
          if (Option(r.get("dataChange")).forall(_.asBoolean(true)))
            dcRemoves += p
        }
        Option(n.get("txn")).foreach(t => txns += t.get("appId").asText)
        Option(n.get("domainMetadata")).foreach(d => domains += d.get("domain").asText)
      }
      val addSet = adds.result()
      // "adds without removes" is NOT sufficient for blindness: an
      // insert-only MERGE reads the table and emits only adds, and a
      // whole-table reader racing it must NOT rebase over those
      // post-images (duplicate-key anomaly). The writer stamps
      // commitInfo.isBlindAppend at commit time (delta-spark convention);
      // when a foreign commit lacks the flag, fall back to the operation
      // name — only known append shapes count as blind, read-based
      // operations' adds are rewrites even with an empty remove set.
      val appendOps = Set("WRITE", "STREAMING UPDATE", "Append",
        "CREATE TABLE", "CONVERT", "CLONE")
      val blind = !hasRemoves && blindInfo.getOrElse(appendOps.contains(op))
      WinnerSummary(v, op, hasProtocol, hasMetadata,
        blindAdds = if (blind) addSet else Set.empty,
        rewriteAdds = if (blind) Set.empty else addSet,
        removes = removes.result(), dataChangeRemoves = dcRemoves.result(),
        txnAppIds = txns.result(), domains = domains.result())
    }
  }

  /** Classify the race: None ⇒ disjoint, safe to rebase at the next free
    * version; Some(reason) ⇒ true conflict, abort with the reason.
    *
    * `delta.rowTracking` is excluded from domain conflicts on both sides:
    * every data commit on a row-tracking table advances the high-water
    * mark, and the rebase re-derives it from the winner's — concurrent
    * marks compose, they do not conflict.
    */
  def classify(
      scope: ReadScope,
      ourRemoves: Set[String],
      ourTxnAppIds: Set[String],
      ourDomains: Set[String],
      serializable: Boolean,
      winners: Seq[WinnerSummary]): Option[String] = {
    val composable = Set("delta.rowTracking")
    winners.view.flatMap { w =>
      def at = s"(version ${w.version}, ${w.operation})"
      lazy val removedRead: Set[String] = scope match {
        case ReadScope.Files(paths) => w.removes intersect paths
        case _ => Set.empty
      }
      if (w.hasProtocol)
        Some(s"protocol changed concurrently $at")
      else if (scope == ReadScope.Audit)
        None // audits tolerate everything else
      else if (w.hasMetadata)
        Some(s"metadata changed concurrently $at")
      else if ((w.txnAppIds intersect ourTxnAppIds).nonEmpty)
        Some(s"concurrent transaction for appId " +
          s"${(w.txnAppIds intersect ourTxnAppIds).mkString(",")} $at")
      else if (((w.domains intersect ourDomains) -- composable).nonEmpty)
        Some(s"concurrent domainMetadata for " +
          s"${((w.domains intersect ourDomains) -- composable).mkString(",")} $at")
      else if ((w.removes intersect ourRemoves).nonEmpty)
        Some(s"concurrent delete-delete on " +
          s"${(w.removes intersect ourRemoves).take(3).mkString(",")} $at")
      else if (removedRead.nonEmpty)
        Some(s"concurrent delete of files this transaction read: " +
          s"${removedRead.take(3).mkString(",")} $at")
      else scope match {
        case ReadScope.Exclusive
          if w.blindAdds.nonEmpty || w.rewriteAdds.nonEmpty || w.removes.nonEmpty =>
          Some(s"concurrent data change under an exclusive operation $at")
        case ReadScope.Table if w.rewriteAdds.nonEmpty =>
          Some(s"concurrent rewrite added files a whole-table read should " +
            s"have seen: ${w.rewriteAdds.take(3).mkString(",")} $at")
        case ReadScope.Table if serializable && w.blindAdds.nonEmpty =>
          Some(s"concurrent append under Serializable isolation: " +
            s"${w.blindAdds.take(3).mkString(",")} $at")
        case ReadScope.Table if w.dataChangeRemoves.nonEmpty =>
          // a winner dropped ROWS from files this whole-table read
          // consulted (its surviving-row post-images are rewriteAdds,
          // caught above, so this is a whole-file delete) — decisions made
          // over those rows may resurrect them. dataChange=false removes
          // (OPTIMIZE) moved rows without changing them and rebase cleanly.
          Some(s"concurrent delete of files a whole-table read consulted: " +
            s"${w.dataChangeRemoves.take(3).mkString(",")} $at")
        case _ => None
      }
    }.headOption
  }
}
