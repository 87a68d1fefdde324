package graft.destinations

import graft.SparkSpec
import graft.sources.DeltaLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based randomized soak of the whole Delta write/read stack: a
  * seeded op sequence (append / upsert / delete / overwrite / compact /
  * restore / properties / checkpoint / cleanup / vacuum) runs against BOTH
  * the real table and a trivial in-memory model, and after EVERY op the
  * table must read back exactly as the model predicts, the version
  * checksum must audit clean, and a random still-materialized historical
  * version must time-travel correctly. Hand-written specs pin each op in
  * isolation; this pins their COMPOSITIONS — the protocol bugs that only
  * appear three ops deep (a restore after a checkpoint after a DV delete)
  * are exactly the ones single-op tests never reach.
  */
class DeltaModelSpec extends SparkSpec {
  import spark.implicits._

  private type State = Map[Long, (String, String)] // id -> (v, tag)

  private def runModel(seed: Long, dvTable: Boolean): Unit = {
    val rnd = new scala.util.Random(seed)
    val table = tmpDir(s"dw-model-$seed-$dvTable").resolve("t").toString
    val props =
      if (dvTable) Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true")
      else Map.empty[String, String]
    // the model table carries a DEFAULTed column (allowColumnDefaults):
    // writes below mostly OMIT `tag`, so every op shape's fill semantics
    // are pinned in composition — append/overwrite/upsert-rewrite take the
    // CURRENT default, merge/UPDATE rewrites keep the stored tag, merge
    // inserts default — across a mid-run setDefault flip and restores
    // (which revert the default with the schema they re-emit).
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType),
        DeltaWrite.defaultField("tag", StringType, "'d0'"))),
      properties = props)

    var state: State = Map.empty
    var curDefault = "d0"
    var nextId = 0L
    // data versions the model can restore/travel to (version -> (state,
    // default-at-that-version)); vacuum invalidates time travel to
    // tombstoned files, so the map is cleared when one runs
    var versions = Map[Long, (State, String)](0L -> ((state, curDefault)))
    def fresh(n: Int): Seq[(Long, String)] = {
      val rows = (0 until n).map(i => (nextId + i, s"v${nextId + i}"))
      nextId += n
      rows
    }
    def df(rows: Seq[(Long, String)]) = rows.toDF("id", "v")
      .repartition(1 + rnd.nextInt(2))
    def tagged(rows: Seq[(Long, String)]) = rows.map { case (k, v) => k -> ((v, curDefault)) }

    (1 to 18).foreach { step =>
      val op = rnd.nextInt(12)
      op match {
        case 0 | 1 | 2 => // append (sometimes providing the defaulted column)
          val rows = fresh(1 + rnd.nextInt(120))
          val explicitTag = rnd.nextDouble() < 0.3
          val v =
            if (explicitTag)
              DeltaWrite.append(spark, table,
                rows.map { case (k, vv) => (k, vv, s"x$k") }.toDF("id", "v", "tag")
                  .repartition(1 + rnd.nextInt(2)))
            else DeltaWrite.append(spark, table, df(rows))
          state = state ++ rows.map { case (k, vv) =>
            k -> ((vv, if (explicitTag) s"x$k" else curDefault)) }
          versions += v -> ((state, curDefault))
        case 3 | 4 => // upsert: update a sample of survivors + some fresh
          val updates = state.keys.toSeq.sorted
            .filter(_ => rnd.nextDouble() < 0.3)
            .map(k => (k, s"u$step-$k"))
          val inserts = fresh(rnd.nextInt(40))
          if (updates.nonEmpty || inserts.nonEmpty) {
            val v = DeltaWrite.upsert(spark, table, df(updates ++ inserts), Seq("id"))
            // upsert REPLACES matched rows with the source row cast to
            // schema: the absent tag takes the current default
            state = state ++ tagged(updates ++ inserts)
            versions += v -> ((state, curDefault))
          }
        case 5 => // delete by modulus predicate (DV path on the DV table)
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          val before = DeltaLog.snapshot(spark, table).version
          val v = DeltaWrite.delete(spark, table, s"id % $m = $r")
          state = state.filterNot { case (k, _) => k % m == r }
          if (v != before) versions += v -> ((state, curDefault))
        case 6 => // layout maintenance: compact (sometimes clustered) or purge
          val v = rnd.nextInt(3) match {
            case 0 => DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)
            case 1 => DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30,
              clusterBy = Seq("id", "v"),
              curve = if (rnd.nextBoolean()) "hilbert" else "zorder")
            case 2 => DeltaWrite.reorgPurge(spark, table) // no-op without DVs
          }
          versions += v -> ((state, curDefault))
        case 7 => // restore to a random still-materialized data version
          if (versions.nonEmpty) {
            val targets = versions.keys.toSeq.sorted
            val tgt = targets(rnd.nextInt(targets.size))
            val v = DeltaWrite.restore(spark, table, tgt)
            // restore re-emits the target schema, so the DEFAULT reverts
            // with the data
            state = versions(tgt)._1
            curDefault = versions(tgt)._2
            versions += v -> ((state, curDefault))
          }
        case 8 => // overwrite with a small fresh set (rare full reset)
          if (rnd.nextDouble() < 0.3) {
            val rows = fresh(1 + rnd.nextInt(30))
            val v = DeltaWrite.overwrite(spark, table, df(rows))
            state = tagged(rows).toMap
            versions += v -> ((state, curDefault))
          } else if (rnd.nextBoolean()) {
            val v = DeltaWrite.setProperties(spark, table,
              Map(s"graft.model.step" -> step.toString))
            if (v > 0) versions += v -> ((state, curDefault))
          } else { // flip the column default mid-life
            val v = DeltaWrite.setDefault(spark, table, "tag", s"'d$step'")
            curDefault = s"d$step"
            versions += v -> ((state, curDefault))
          }
        case 9 => // maintenance: checkpoint / metadata cleanup / vacuum
          rnd.nextInt(3) match {
            case 0 => DeltaWrite.checkpoint(spark, table)
            case 1 =>
              DeltaWrite.checkpoint(spark, table)
              DeltaWrite.cleanupMetadata(spark, table)
              // cleaned commits no longer resolve: only versions at/after
              // the checkpoint seed stay travel/restore targets
              val cur = DeltaLog.snapshot(spark, table).version
              versions = versions.filter(_._1 >= cur)
            case 2 =>
              DeltaWrite.vacuum(spark, table, retainMs = 0L)
              versions = Map.empty // tombstoned files gone: no more travel
          }
        case 10 | 11 if rnd.nextInt(3) == 0 => // UPDATE by modulus predicate
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          val before = DeltaLog.snapshot(spark, table).version
          val v = DeltaWrite.update(spark, table, s"id % $m = $r",
            Map("v" -> "concat(v, '*')"))
          // UPDATE rewrites through merge: the un-SET tag column is KEPT
          state = state.map { case (k, (vv, tg)) =>
            if (k % m == r) k -> ((vv + "*", tg)) else k -> ((vv, tg)) }
          if (v != before) versions += v -> ((state, curDefault))
        case 10 | 11 => // full MERGE: conditional delete + update, insert, NMBS
          import DeltaWrite.MergeClause
          val updates = state.keys.toSeq.sorted
            .filter(_ => rnd.nextDouble() < 0.25)
            .map(k => (k, s"m$step-$k"))
          val inserts = fresh(rnd.nextInt(30))
          val srcRows = updates ++ inserts
          if (srcRows.nonEmpty) {
            val nmbs = rnd.nextBoolean()
            val before = DeltaLog.snapshot(spark, table).version
            val v = DeltaWrite.merge(spark, table, df(srcRows),
              condition = "t.id = s.id",
              matched = Seq(
                MergeClause.Delete(Some("t.id % 7 = 0")),
                MergeClause.Update(None, Map("v" -> "concat(s.v, '!')"))),
              notMatched = Seq(MergeClause.Insert(None,
                Map("id" -> "s.id", "v" -> "s.v"))),
              notMatchedBySource =
                if (!nmbs) Nil
                else Seq(MergeClause.SourceUpdate(Some("t.id % 11 = 3"),
                  Map("v" -> "concat(t.v, '~')"))))
            val srcMap = srcRows.toMap
            val matchedKeys = srcMap.keySet intersect state.keySet
            state = state.filterNot { case (k, _) => matchedKeys(k) && k % 7 == 0 }
            // merge UPDATE/SourceUpdate keep the stored tag (un-SET
            // columns stay); INSERT clauses take the current default
            state = state.map { case (k, (vv, tg)) =>
              if (matchedKeys(k)) k -> ((srcMap(k) + "!", tg))
              else if (nmbs && !srcMap.contains(k) && k % 11 == 3) k -> ((vv + "~", tg))
              else k -> ((vv, tg))
            }
            state = state ++ tagged(
              srcRows.filterNot { case (k, _) => matchedKeys(k) })
            if (v != before) versions += v -> ((state, curDefault))
          }
      }

      // after EVERY op: exact state equality (values AND default-filled tags)
      val got = DeltaLog.read(spark, table)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(got == state,
        s"seed=$seed dv=$dvTable step=$step op=$op: " +
          s"missing=${(state.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- state.keySet).take(5)} " +
          s"diff=${state.keySet.intersect(got.keySet)
            .filter(k => state(k) != got(k)).take(3)
            .map(k => s"$k:${state(k)}!=${got(k)}")}")
      // … the checksum chain audits clean (cleanup may drop old crcs;
      // the latest must always exist and agree) …
      assert(DeltaLog.verifyChecksum(spark, table, None),
        s"seed=$seed dv=$dvTable step=$step: latest version lost its checksum")
      // … and a random still-materialized old version time-travels right
      if (versions.size > 1 && rnd.nextDouble() < 0.5) {
        val old = versions.keys.toSeq.sorted.apply(rnd.nextInt(versions.size))
        val tr = DeltaLog.read(spark, table, versionAsOf = Some(old))
          .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
        assert(tr == versions(old)._1,
          s"seed=$seed dv=$dvTable step=$step travel to $old diverged")
      }
    }

    // end of run: purge any DVs, export Iceberg metadata, and read the
    // table back THROUGH THE ICEBERG PATH only — the cross-format read
    // must agree with the model whatever composition the run produced
    DeltaWrite.reorgPurge(spark, table)
    IcebergExport.export(spark, table)
    val viaIceberg = IcebergExport.readThroughIceberg(spark, table)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(viaIceberg == state,
      s"seed=$seed dv=$dvTable: Iceberg read diverged from the model: " +
        s"missing=${(state.keySet -- viaIceberg.keySet).take(5)} " +
        s"extra=${(viaIceberg.keySet -- state.keySet).take(5)}")
  }

  // Opt-in extended hunt (the r13/r14 pre-wrap ritual): more seeds, both
  // configs — GRAFT_MODEL_HUNT=seed1,seed2 sbt "testOnly …DeltaModelSpec"
  // (tests fork, so the env var reaches the test JVM); absent, the suite
  // keeps its fast fixed seeds.
  sys.env.get("GRAFT_MODEL_HUNT").foreach { seeds =>
    seeds.split(',').map(_.trim.toLong).foreach { s =>
      test(s"hunt seed $s: plain table matches the model") {
        runModel(seed = s, dvTable = false)
      }
      test(s"hunt seed $s: DV+CDF table matches the model") {
        runModel(seed = s, dvTable = true)
      }
    }
  }

  test("random op compositions: plain table matches the model at every step") {
    runModel(seed = 1013L, dvTable = false)
  }

  test("random op compositions: DV+CDF table matches the model at every step") {
    runModel(seed = 2027L, dvTable = true)
  }

  /** Interleaved-writer mode: every step's op RACES an injected winner that
    * commits first (via `racePublishHook`). A blind-append winner must
    * rebase cleanly under WriteSerializable — including the documented
    * anomaly (a racing DELETE/overwrite does not see the winner's rows, so
    * they survive, which the model encodes). A metadata-change winner must
    * abort every data op loudly (and leave the table exactly as the winner
    * wrote it); vacuum's audit commits alone tolerate it. After every step
    * the table must match the model and the checksum chain must audit.
    */
  private def runInterleaved(seed: Long, dvTable: Boolean): Unit = {
    val rnd = new scala.util.Random(seed)
    val table = tmpDir(s"dw-race-$seed-$dvTable").resolve("t").toString
    val props =
      if (dvTable) Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true")
      else Map.empty[String, String]
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      properties = props)

    var state: Map[Long, String] = Map.empty
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, String)] = {
      val rows = (0 until n).map(i => (nextId + i, s"v${nextId + i}"))
      nextId += n
      rows
    }
    def df(rows: Seq[(Long, String)]) = rows.toDF("id", "v")
      .repartition(1 + rnd.nextInt(2))

    (1 to 14).foreach { step =>
      // the racing winner: blind append (rebasable) or metadata change
      // (aborts every non-audit loser)
      val winnerIsMeta = rnd.nextInt(3) == 0
      var winnerRows: Seq[(Long, String)] = Nil
      val winner: (org.apache.hadoop.fs.Path, Long) => Unit =
        if (winnerIsMeta) (_, _) =>
          DeltaWrite.setProperties(spark, table,
            Map(s"graft.race.step" -> step.toString))
        else { (_, _) =>
          winnerRows = fresh(1 + rnd.nextInt(30))
          DeltaWrite.append(spark, table, df(winnerRows))
        }

      val op = rnd.nextInt(6)
      DeltaWrite.racePublishHook = Some(winner)
      try {
        val attempt: Either[Throwable, Map[Long, String] => Map[Long, String]] =
          try {
            op match {
              case 0 => // append
                val rows = fresh(1 + rnd.nextInt(80))
                DeltaWrite.append(spark, table, df(rows))
                Right(s => s ++ rows)
              case 1 => // upsert (updates of pre-step keys + fresh inserts)
                val updates = state.keys.toSeq.sorted
                  .filter(_ => rnd.nextDouble() < 0.3)
                  .map(k => (k, s"u$step-$k"))
                val inserts = fresh(1 + rnd.nextInt(30))
                DeltaWrite.upsert(spark, table, df(updates ++ inserts), Seq("id"))
                Right(s => s ++ updates ++ inserts)
              case 2 => // delete: does NOT see the winner's rows (anomaly)
                val m = 2 + rnd.nextInt(5)
                val r = rnd.nextInt(m)
                DeltaWrite.delete(spark, table, s"id % $m = $r")
                Right(s => s.filterNot { case (k, _) =>
                  k % m == r && !winnerRows.exists(_._1 == k) })
              case 3 => // compact
                DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)
                Right(identity)
              case 4 => // overwrite: winner's unseen file survives (anomaly)
                val rows = fresh(1 + rnd.nextInt(20))
                DeltaWrite.overwrite(spark, table, df(rows))
                Right(_ => winnerRows.toMap ++ rows)
              case 5 => // vacuum (audit commits tolerate even metadata winners)
                DeltaWrite.vacuum(spark, table, retainMs = 0L)
                Right(identity)
            }
          } catch { case e: Concurrency.ConflictException => Left(e) }

        val winnerRan = DeltaWrite.racePublishHook.isEmpty
        // winner-first ordering: its append lands in the model before the
        // loser's effect (except where the op's effect already encodes the
        // anomaly explicitly)
        if (winnerRan && !winnerIsMeta && op != 4) state = state ++ winnerRows
        attempt match {
          case Right(effect) =>
            assert(!(winnerRan && winnerIsMeta && op != 5),
              s"seed=$seed dv=$dvTable step=$step op=$op: a metadata-change " +
                "winner must abort a racing data op, but it rebased")
            state = effect(state)
          case Left(e) =>
            assert(winnerRan && winnerIsMeta,
              s"seed=$seed dv=$dvTable step=$step op=$op: unexpected " +
                s"conflict abort against a blind-append winner: ${e.getMessage}")
        }
      } finally DeltaWrite.racePublishHook = None

      val got = DeltaLog.read(spark, table)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == state,
        s"seed=$seed dv=$dvTable step=$step op=$op winnerMeta=$winnerIsMeta: " +
          s"missing=${(state.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- state.keySet).take(5)}")
      assert(DeltaLog.verifyChecksum(spark, table, None),
        s"seed=$seed dv=$dvTable step=$step: checksum chain broke")
    }
  }

  test("interleaved writers: plain table matches the model under constant races") {
    runInterleaved(seed = 3041L, dvTable = false)
  }

  test("interleaved writers: DV+CDF table matches the model under constant races") {
    runInterleaved(seed = 4057L, dvTable = true)
  }
}
