package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.destinations.DeltaWrite
import graft.sources.DeltaLog

/** Continuous Delta streaming source ([[DeltaTailSource]],
  * `format("graft-delta")`): initial snapshot + incremental tailing,
  * maxFilesPerTrigger admission, layout-commit invisibility, change-commit
  * policy, and offset durability across stop/restart mid-log.
  */
class DeltaTailSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def rows(from: Long, to: Long) = {
    import spark.implicits._
    (from to to).map(i => (i, s"v$i")).toDF("id", "v")
  }

  private def mkTable(name: String, props: Map[String, String] = Map.empty): String = {
    val t = tmpDir(name).resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema, properties = props)
    t
  }

  /** Drain the tail into a Delta sink with AvailableNow; returns the
    * number of non-empty micro-batches the run processed.
    */
  private def drain(src: String, dst: String, cp: String,
      maxFilesPerTrigger: Option[Int] = None,
      options: Map[String, String] = Map.empty): Int = {
    val batches = new java.util.concurrent.atomic.AtomicInteger
    val reader = spark.readStream.format("graft-delta")
      .options(options ++ maxFilesPerTrigger.map(n =>
        "maxFilesPerTrigger" -> n.toString))
    val q = reader.load(src)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batches.incrementAndGet()
          DeltaWrite.append(batch.sparkSession, dst, batch,
            txn = Some((s"tail-$cp", batchId))): Unit
        }
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  private def ids(table: String): Seq[Long] =
    DeltaLog.read(spark, table).select("id").collect().map(_.getLong(0)).toSeq

  test("initial snapshot + rate-limited drain: every live row exactly once, bounded batches") {
    val src = mkTable("tail-basic")
    DeltaWrite.append(spark, src, rows(1, 20).repartition(2))
    DeltaWrite.append(spark, src, rows(21, 40).repartition(2))
    val dst = mkTable("tail-basic-dst")
    val cp = tmpDir("tail-basic-cp").toString
    val batches = drain(src, dst, cp, maxFilesPerTrigger = Some(1))
    assert(batches == 4, s"4 files at 1 file/trigger must take 4 batches, got $batches")
    assert(ids(dst).sorted == (1L to 40L))
  }

  test("restart mid-log: second run resumes from the durable offset, no re-reads") {
    val src = mkTable("tail-restart")
    DeltaWrite.append(spark, src, rows(1, 10).repartition(2))
    val dst = mkTable("tail-restart-dst")
    val cp = tmpDir("tail-restart-cp").toString
    assert(drain(src, dst, cp) >= 1)
    assert(ids(dst).sorted == (1L to 10L))
    // new commits while the stream is down; a layout-only OPTIMIZE between
    // them must stay invisible (its rearranged files never re-deliver)
    DeltaWrite.append(spark, src, rows(11, 20).repartition(2))
    DeltaWrite.compact(spark, src, targetFileBytes = 1L << 30)
    DeltaWrite.append(spark, src, rows(21, 30).repartition(1))
    drain(src, dst, cp)
    assert(ids(dst).sorted == (1L to 30L), "tail must deliver each row exactly once")
    // third run with nothing new: zero batches
    assert(drain(src, dst, cp) == 0)
    assert(ids(dst).sorted == (1L to 30L))
  }

  test("change commit: fails loudly by default; skipChangeCommits passes it over") {
    val src = mkTable("tail-change")
    DeltaWrite.append(spark, src, rows(1, 10).repartition(1))
    val dst = mkTable("tail-change-dst")
    val cp = tmpDir("tail-change-cp").toString
    drain(src, dst, cp)
    DeltaWrite.delete(spark, src, "id <= 3")
    DeltaWrite.append(spark, src, rows(11, 15).repartition(1))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(src, dst, cp)
    }
    assert(e.getCause.getMessage.contains("skipChangeCommits"), e.getCause.getMessage)
    // with the option the delete commit is skipped, the append still lands
    drain(src, dst, cp, options = Map("skipChangeCommits" -> "true"))
    assert(ids(dst).sorted == (1L to 15L))
  }

  test("initial snapshot respects deletion vectors: only live rows stream") {
    val src = mkTable("tail-dv", props = Map("delta.enableDeletionVectors" -> "true"))
    DeltaWrite.append(spark, src, rows(1, 100).repartition(1))
    DeltaWrite.delete(spark, src, "id % 2 = 0") // merge-on-read DV
    val dst = mkTable("tail-dv-dst")
    drain(src, dst, tmpDir("tail-dv-cp").toString)
    assert(ids(dst).sorted == (1L to 100L).filter(_ % 2 == 1))
  }

  test("startingVersion skips the snapshot: incremental replay from the given version only") {
    val src = mkTable("tail-startver")
    DeltaWrite.append(spark, src, rows(1, 10))  // v1
    DeltaWrite.append(spark, src, rows(11, 20)) // v2
    val dst = mkTable("tail-startver-dst")
    drain(src, dst, tmpDir("tail-startver-cp").toString,
      options = Map("startingVersion" -> "2"))
    assert(ids(dst).sorted == (11L to 20L), "v0/v1 rows must NOT stream")

    // "latest" = only commits after the stream starts: an AvailableNow run
    // started at latest drains nothing, and the offset is durable, so new
    // commits stream on the next run from the same checkpoint
    val dst2 = mkTable("tail-latest-dst")
    val cp2 = tmpDir("tail-latest-cp").toString
    assert(drain(src, dst2, cp2, options = Map("startingVersion" -> "latest")) == 0)
    DeltaWrite.append(spark, src, rows(21, 30)) // v3, while stream is down
    drain(src, dst2, cp2, options = Map("startingVersion" -> "latest"))
    assert(ids(dst2).sorted == (21L to 30L))
  }

  test("maxBytesPerTrigger admission: tiny budget still admits one file per batch") {
    val src = mkTable("tail-bytes")
    DeltaWrite.append(spark, src, rows(1, 20).repartition(2))
    DeltaWrite.append(spark, src, rows(21, 40).repartition(2))
    val dst = mkTable("tail-bytes-dst")
    // 1-byte budget: every file alone exceeds it, so each batch admits
    // exactly one file (the at-least-one rule) — 4 files, 4 batches
    val batches = drain(src, dst, tmpDir("tail-bytes-cp").toString,
      options = Map("maxBytesPerTrigger" -> "1"))
    assert(batches == 4, s"got $batches")
    assert(ids(dst).sorted == (1L to 40L))
  }

  test("crash recovery: replayed initial-snapshot offset serves the ORIGINAL snapshot") {
    val src = mkTable("tail-crash")
    DeltaWrite.append(spark, src, rows(1, 10).repartition(2))
    val meta = tmpDir("tail-crash-meta").toString
    def mkSource() = new DeltaTailSource(spark, src, meta,
      maxFilesPerTrigger = Some(1), maxBytesPerTrigger = None,
      skipChangeCommits = false, startingVersion = None,
      startingTimestamp = None, readChangeFeed = false)
    // plan the first 1-file batch of the 2-file initial snapshot, then
    // "crash" before the engine commits the batch
    val s1 = mkSource()
    val end1 = s1.latestOffset(null, s1.getDefaultReadLimit)
    s1.stop()
    // the table advances while the stream is down
    DeltaWrite.append(spark, src, rows(11, 20).repartition(1))
    // restart: the engine replays getBatch(None, end1) on a FRESH source.
    // The durable start marker pins the ORIGINAL snapshot version, and the
    // file list is reconstructed by time travel — the replayed batch must
    // be the exact original slice, not empty, and contain no post-crash rows
    val s2 = mkSource()
    val replayed = org.apache.spark.sql.GraftShims.stripStreaming(spark,
      s2.getBatch(None, end1.asInstanceOf[org.apache.spark.sql.execution.streaming.Offset]))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(replayed.nonEmpty, "replayed initial-snapshot batch must not be empty")
    assert(replayed.subsetOf((1L to 10L).toSet),
      s"replay must serve the original snapshot only, got $replayed")
    s2.stop()
  }

  test("startingTimestamp parsing: Z-offset honored, date-only accepted, at-timestamp included") {
    // an explicit offset is honored as spelled (NOT re-read in local time)
    assert(DeltaTailSource.parseTs(spark, "2024-03-01T12:00:00Z") ==
      java.time.Instant.parse("2024-03-01T12:00:00Z"))
    assert(DeltaTailSource.parseTs(spark, "2024-03-01 12:00:00+02:00") ==
      java.time.Instant.parse("2024-03-01T10:00:00Z"))
    // date-only input resolves at session-zone midnight instead of throwing
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    assert(DeltaTailSource.parseTs(spark, "2024-03-01") ==
      java.time.LocalDate.parse("2024-03-01").atStartOfDay(zone).toInstant)
    // a commit AT the exact timestamp is included (>= ts, delta-spark
    // semantics), not skipped by an at-or-before-then-+1 resolution
    val src = mkTable("tail-ts-incl")
    Thread.sleep(1100) // separate v0's and v1's mtimes
    DeltaWrite.append(spark, src, rows(1, 5)) // v1
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val c1 = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(src, f"_delta_log/${1L}%020d.json"))
    val ts = java.time.Instant.ofEpochMilli(c1.getModificationTime)
    assert(DeltaLog.earliestVersionAtOrAfter(spark, src, ts) == 1L)
    assert(DeltaLog.earliestVersionAtOrAfter(spark, src, ts.plusMillis(1)) == 2L)
  }

  test("startingTimestamp resolves to the earliest commit after the timestamp") {
    val src = mkTable("tail-ts")
    DeltaWrite.append(spark, src, rows(1, 10))
    Thread.sleep(1200) // commit timestamps have ~second granularity
    val cut = new java.sql.Timestamp(System.currentTimeMillis()).toString
    Thread.sleep(1200)
    DeltaWrite.append(spark, src, rows(11, 20))
    val dst = mkTable("tail-ts-dst")
    drain(src, dst, tmpDir("tail-ts-cp").toString,
      options = Map("startingTimestamp" -> cut))
    assert(ids(dst).sorted == (11L to 20L), s"got ${ids(dst).sorted}")
    // both range options together refuse
    intercept[Exception] {
      drain(src, mkTable("tail-ts-dst2"), tmpDir("tail-ts-cp2").toString,
        options = Map("startingTimestamp" -> cut, "startingVersion" -> "1"))
    }
  }

  test("tail drains interleaved with racing writers: no loss, no duplication") {
    val src = mkTable("tail-race")
    val dst = mkTable("tail-race-dst")
    val cp = tmpDir("tail-race-cp").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      // two writers whose lost commit races REBASE (the r14 concurrency
      // layer) while availableNow drains run concurrently — every drain
      // sees a prefix-consistent log and the union must be exact
      val writers: Seq[java.util.concurrent.Future[Unit]] = (0 until 2).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = (0 until 4).foreach { i =>
            val base = (w * 1000 + i * 100).toLong
            DeltaWrite.append(spark, src, rows(base + 1, base + 20))
          }
        })
      }
      while (!writers.forall(_.isDone)) {
        drain(src, dst, cp)
        Thread.sleep(50)
      }
      writers.foreach(_.get())
    } finally pool.shutdown()
    drain(src, dst, cp) // final catch-up after the last commit
    val expected = (for (w <- 0 until 2; i <- 0 until 4; d <- 1 to 20)
      yield (w * 1000 + i * 100 + d).toLong).sorted
    assert(ids(dst).sorted == expected)
    assert(ids(src).sorted == expected)
  }

  test("readChangeFeed default: initial snapshot streams as insert rows, then changes") {
    import org.apache.spark.sql.Row
    val src = mkTable("tail-cdf-snap", props = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, src, rows(1, 10).repartition(2))          // v1
    DeltaWrite.delete(spark, src, "id <= 2")                           // v2
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val batches = new java.util.concurrent.atomic.AtomicInteger
    val cp = tmpDir("tail-cdf-snap-cp").toString
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("readChangeFeed", "true") // NO startingVersion: snapshot start
        .option("maxFilesPerTrigger", "1")
        .load(src)
        .writeStream
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rs = batch.select("id", "_change_type", "_commit_version").collect()
          if (rs.nonEmpty) {
            batches.incrementAndGet()
            got.synchronized {
              got ++= rs.map((r: Row) => (r.getLong(0), r.getString(1), r.getLong(2)))
            }: Unit
          }
        }
        .start()
      q.awaitTermination()
    }
    drainCdf()
    // snapshot at v2 = ids 3..10, synthesized as inserts AT the snapshot
    // version; the 1-file budget slices the 2-file snapshot into 2 batches
    assert(batches.get() == 2, s"got ${batches.get()}")
    assert(got.toSet == (3L to 10L).map(i => (i, "insert", 2L)).toSet, got.toSet)
    // post-snapshot commits stream as CHANGES from the durable offset
    DeltaWrite.delete(spark, src, "id = 5")                            // v3
    drainCdf()
    assert(got.count(_ == ((5L, "delete", 3L))) == 1, got.toSeq)
    assert(got.size == 9, got.toSeq) // 8 snapshot inserts + 1 delete change
  }

  test("readChangeFeed streams the CDF commit-by-commit, matching the batch CDF read") {
    import org.apache.spark.sql.Row
    val src = mkTable("tail-cdf", props = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, src, rows(1, 10).repartition(1))          // v1 inserts
    DeltaWrite.upsert(spark, src,                                      // v2 updates+insert
      rows(5, 6).withColumn("v", concat(col("v"), lit("!")))
        .unionByName(rows(11, 12)), Seq("id"))
    DeltaWrite.delete(spark, src, "id % 4 = 0")                        // v3 deletes
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    val batches = new java.util.concurrent.atomic.AtomicInteger
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .option("maxFilesPerTrigger", "1") // = one COMMIT per trigger in CDF mode
      .load(src)
      .writeStream
      .option("checkpointLocation", tmpDir("tail-cdf-cp").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rs = batch.select("id", "v", "_change_type", "_commit_version").collect()
        if (rs.nonEmpty) {
          batches.incrementAndGet()
          got.synchronized {
            got ++= rs.map((r: Row) =>
              (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
          }: Unit
        }
      }
      .start()
    q.awaitTermination()
    assert(batches.get() == 3, s"3 commits at 1 commit/trigger, got ${batches.get()}")
    val expect = graft.sources.DeltaLog.readCdf(spark, src, 0L)
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.sorted == expect.toSeq.sorted)
    // within one trigger, every row comes from one commit
    assert(got.groupBy(_._4).keySet == Set(1L, 2L, 3L))
  }

  test("sink: writeStream.format(graft-delta) lands micro-batches as Delta commits") {
    val src = mkTable("sink-src")
    DeltaWrite.append(spark, src, rows(1, 20).repartition(2))
    DeltaWrite.append(spark, src, rows(21, 40).repartition(2))
    val dst = mkTable("sink-dst")
    val cp = tmpDir("sink-cp").toString
    // end-to-end: delta source → delta sink, pure format API, exactly-once
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "1").load(src)
        .writeStream.format("graft-delta")
        .option("checkpointLocation", cp)
        .option("txnAppId", s"sink-test-$cp")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    run()
    assert(ids(dst).sorted == (1L to 40L))
    // 4 source files at 1/trigger = 4 sink commits on top of create
    assert(graft.sources.DeltaLog.snapshot(spark, dst).version == 4L)
    // restart with nothing new: no duplicate commits, no duplicate rows
    run()
    assert(ids(dst).sorted == (1L to 40L))
    assert(graft.sources.DeltaLog.snapshot(spark, dst).version == 4L)
    // non-append output modes refuse
    val agg = spark.readStream.format("graft-delta").load(src)
      .groupBy("v").count()
    val e = intercept[Exception] {
      val q = agg.writeStream.format("graft-delta")
        .outputMode("complete")
        .option("checkpointLocation", tmpDir("sink-cp2").toString)
        .trigger(Trigger.AvailableNow())
        .start(mkTable("sink-dst2"))
      q.awaitTermination()
    }
    assert(e.getMessage.contains("Append") || e.getMessage.toLowerCase.contains("complete"),
      e.getMessage)
  }

  test("offsets are the documented delta-source shape and replay deterministically") {
    val o = DeltaTailSource.DeltaTailOffset(DeltaTailSource.Pos(7L, 3, initial = true))
    assert(o.json() ==
      """{"tableVersion":7,"fileIndex":3,"isInitialSnapshot":true}""")
    assert(DeltaTailSource.parsePos(o.json()) == o.pos)
  }
}
