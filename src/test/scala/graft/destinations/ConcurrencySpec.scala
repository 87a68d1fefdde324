package graft.destinations

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.sources.DeltaLog

/** Multi-writer optimistic concurrency ([[Concurrency]]): a writer that
  * loses the commit race rebases disjoint work onto the winners' versions
  * (WriteSerializable rules) and aborts loudly — naming the conflict — on
  * true semantic overlap. Deterministic interleavings are injected via
  * `DeltaWrite.racePublishHook` (the winner commits the contended version
  * right before the loser's atomic claim); a threaded soak exercises the
  * real race. Every rebased table must stay fully consistent: exact rows,
  * sequential versions, and a valid version-checksum chain.
  */
class ConcurrencySpec extends SparkSpec {

  private def mkTable(name: String, props: Map[String, String] = Map.empty,
      partitionBy: Seq[String] = Nil): String = {
    val table = tmpDir(name).resolve("t").toString
    DeltaWrite.createIfAbsent(spark, table,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType),
        StructField("p", StringType))),
      partitionBy = partitionBy, properties = props)
    table
  }

  private def rows(from: Long, to: Long, p: String) = {
    import spark.implicits._
    (from to to).map(i => (i, s"v$i", p)).toDF("id", "v", "p")
  }

  private def ids(table: String): Set[Long] =
    DeltaLog.read(spark, table).select("id").collect().map(_.getLong(0)).toSet

  /** Interleave: while `loser` is publishing its commit, `winner` claims
    * the version first. Returns the loser's result or the thrown conflict.
    */
  private def race[A](winner: => Unit)(loser: => A): A = {
    DeltaWrite.racePublishHook = Some((_, _) => winner)
    try loser finally DeltaWrite.racePublishHook = None
  }

  test("append x append: loser rebases, both batches present, chain valid") {
    val table = mkTable("cc-append")
    DeltaWrite.append(spark, table, rows(1, 10, "a"))
    val v = race {
      DeltaWrite.append(spark, table, rows(101, 110, "b"))
    } {
      DeltaWrite.append(spark, table, rows(201, 210, "c"))
    }
    // winner took version 2; the rebased loser landed at 3
    assert(v == 3L)
    assert(DeltaLog.snapshot(spark, table).version == 3L)
    assert(ids(table) == ((1L to 10L) ++ (101L to 110L) ++ (201L to 210L)).toSet)
    assert(DeltaLog.verifyChecksum(spark, table, None))
  }

  test("append x metadata change: loser aborts naming the metadata conflict") {
    val table = mkTable("cc-append-meta")
    DeltaWrite.append(spark, table, rows(1, 10, "a"))
    val e = intercept[Concurrency.ConflictException] {
      race {
        DeltaWrite.setProperties(spark, table, Map("delta.appendOnly" -> "false"))
      } {
        DeltaWrite.append(spark, table, rows(11, 20, "b"))
      }
    }
    assert(e.getMessage.contains("metadata changed concurrently"))
    // the winner's commit stands; the loser's data files are orphaned, not live
    assert(ids(table) == (1L to 10L).toSet)
  }

  test("upsert x blind append: rebases under WriteSerializable, aborts under Serializable") {
    val table = mkTable("cc-upsert-append")
    DeltaWrite.append(spark, table, rows(1, 10, "a"))
    val v = race {
      DeltaWrite.append(spark, table, rows(101, 110, "b"))
    } {
      DeltaWrite.upsert(spark, table, rows(5, 6, "a"), Seq("id"))
    }
    assert(v == 3L)
    assert(ids(table) == ((1L to 10L) ++ (101L to 110L)).toSet)
    assert(DeltaLog.verifyChecksum(spark, table, None))

    val strict = mkTable("cc-upsert-append-ser",
      props = Map("delta.isolationLevel" -> "Serializable"))
    DeltaWrite.append(spark, strict, rows(1, 10, "a"))
    val e = intercept[Concurrency.ConflictException] {
      race {
        DeltaWrite.append(spark, strict, rows(101, 110, "b"))
      } {
        DeltaWrite.upsert(spark, strict, rows(5, 6, "a"), Seq("id"))
      }
    }
    assert(e.getMessage.contains("Serializable isolation"))
  }

  test("upsert x compact (disjoint partitions): loser rebases over the rearrange") {
    val table = mkTable("cc-upsert-compact", partitionBy = Seq("p"))
    // partition a: one small file the upsert rewrites; partition b: two
    // small files the compaction packs — file-disjoint by construction
    DeltaWrite.append(spark, table, rows(1, 10, "a").repartition(1))
    DeltaWrite.append(spark, table, rows(1000, 1005, "b").repartition(1))
    DeltaWrite.append(spark, table, rows(1006, 1010, "b").repartition(1))
    val v = race {
      DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30,
        where = Map("p" -> "b"))
    } {
      DeltaWrite.upsert(spark, table, rows(5, 6, "a")
        .withColumn("v", concat(col("v"), lit("!"))), Seq("id"))
    }
    assert(v == 5L) // create,3 appends=4; compact won 4... loser rebased to 5
    val all = DeltaLog.read(spark, table).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all.keySet == ((1L to 10L) ++ (1000L to 1010L)).toSet)
    assert(all(5L) == "v5!" && all(6L) == "v6!" && all(7L) == "v7")
    assert(DeltaLog.verifyChecksum(spark, table, None))
  }

  test("upsert x compact touching the SAME file: delete-delete conflict, aborts") {
    val table = mkTable("cc-upsert-compact-overlap")
    // two small files with overlapping id ranges: compaction rewrites both,
    // the upsert needs one of them too
    DeltaWrite.append(spark, table, rows(1, 10, "a").repartition(1))
    DeltaWrite.append(spark, table, rows(11, 20, "a").repartition(1))
    val e = intercept[Concurrency.ConflictException] {
      race {
        DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)
      } {
        DeltaWrite.upsert(spark, table, rows(5, 6, "A"), Seq("id"))
      }
    }
    assert(e.getMessage.contains("delete-delete"))
    assert(ids(table) == (1L to 20L).toSet) // winner's compaction stands
  }

  test("upsert x whole-file delete: whole-table read conflict, aborts") {
    val table = mkTable("cc-upsert-delete")
    DeltaWrite.append(spark, table, rows(1, 10, "a").repartition(1))
    DeltaWrite.append(spark, table, rows(1000, 1010, "b").repartition(1))
    val e = intercept[Concurrency.ConflictException] {
      race {
        // removes the whole high file (no survivors -> bare remove)
        DeltaWrite.delete(spark, table, "id >= 1000")
      } {
        DeltaWrite.upsert(spark, table, rows(5, 6, "A"), Seq("id"))
      }
    }
    assert(e.getMessage.contains("whole-table read") ||
      e.getMessage.contains("delete-delete"))
  }

  test("upsert x upsert rewriting a different file: rebases; same file: aborts") {
    val table = mkTable("cc-upsert-upsert")
    DeltaWrite.append(spark, table, rows(1, 10, "a").repartition(1))
    DeltaWrite.append(spark, table, rows(1000, 1010, "b").repartition(1))
    // disjoint: winner rewrites the high file, loser the low file — but a
    // MERGE rewrite is a changed-data add the loser's whole-table read
    // should have seen, so WriteSerializable still aborts it
    val e = intercept[Concurrency.ConflictException] {
      race {
        DeltaWrite.upsert(spark, table, rows(1005, 1005, "B"), Seq("id"))
      } {
        DeltaWrite.upsert(spark, table, rows(5, 5, "A"), Seq("id"))
      }
    }
    assert(e.getMessage.contains("concurrent rewrite"))
  }

  test("insert-only upsert x upsert: winner's adds are post-images, loser aborts (no dup keys)") {
    val table = mkTable("cc-upsert-insertonly")
    DeltaWrite.append(spark, table, rows(1, 10, "a").repartition(1))
    // the winner upserts a NEW key: it read the table but emits only adds
    // (no removes). commitInfo.isBlindAppend=false marks it non-blind, so
    // the loser's whole-table read must NOT rebase over it — two racing
    // upserts of the same new key would otherwise both land (dup rows)
    val e = intercept[Concurrency.ConflictException] {
      race {
        DeltaWrite.upsert(spark, table, rows(50, 50, "w"), Seq("id"))
      } {
        DeltaWrite.upsert(spark, table, rows(50, 50, "l"), Seq("id"))
      }
    }
    assert(e.getMessage.contains("concurrent rewrite added files"), e.getMessage)
    assert(DeltaLog.read(spark, table).filter(col("id") === 50).count() == 1,
      "exactly one id=50 row may land")
  }

  test("compact x append: compaction rebases over the new file, leaves it uncompacted") {
    val table = mkTable("cc-compact-append")
    DeltaWrite.append(spark, table, rows(1, 10, "a").repartition(1))
    DeltaWrite.append(spark, table, rows(11, 20, "a").repartition(1))
    val v = race {
      DeltaWrite.append(spark, table, rows(101, 110, "c"))
    } {
      DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)
    }
    assert(v == 4L)
    assert(ids(table) == ((1L to 20L) ++ (101L to 110L)).toSet)
    assert(DeltaLog.verifyChecksum(spark, table, None))
  }

  test("compact x delete of a compacted file: read-set conflict, aborts") {
    val table = mkTable("cc-compact-delete")
    DeltaWrite.append(spark, table, rows(1, 10, "a").repartition(1))
    DeltaWrite.append(spark, table, rows(11, 20, "a").repartition(1))
    val e = intercept[Concurrency.ConflictException] {
      race {
        DeltaWrite.delete(spark, table, "id <= 10")
      } {
        DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)
      }
    }
    assert(e.getMessage.contains("delete-delete") ||
      e.getMessage.contains("read"))
    assert(ids(table) == (11L to 20L).toSet)
  }

  test("restore x append: exclusive conflict, aborts") {
    val table = mkTable("cc-restore")
    DeltaWrite.append(spark, table, rows(1, 10, "a"))
    DeltaWrite.append(spark, table, rows(11, 20, "a"))
    val e = intercept[Concurrency.ConflictException] {
      race {
        DeltaWrite.append(spark, table, rows(101, 110, "b"))
      } {
        DeltaWrite.restore(spark, table, 1L)
      }
    }
    assert(e.getMessage.contains("exclusive"))
  }

  test("same txn appId racing: concurrent-transaction conflict; different appIds rebase") {
    val table = mkTable("cc-txn")
    val e = intercept[Concurrency.ConflictException] {
      race {
        DeltaWrite.append(spark, table, rows(1, 5, "a"), txn = Some(("job-1", 7L)))
      } {
        DeltaWrite.append(spark, table, rows(6, 9, "a"), txn = Some(("job-1", 7L)))
      }
    }
    assert(e.getMessage.contains("job-1"))

    val v = race {
      DeltaWrite.append(spark, table, rows(11, 15, "a"), txn = Some(("job-2", 1L)))
    } {
      DeltaWrite.append(spark, table, rows(16, 19, "a"), txn = Some(("job-3", 1L)))
    }
    assert(v > 0 && ids(table).contains(16L) && ids(table).contains(11L))
  }

  test("row tracking: rebased append re-derives the high-water mark, ids stay unique") {
    val table = mkTable("cc-rowtrack",
      props = Map("delta.enableRowTracking" -> "true"))
    DeltaWrite.append(spark, table, rows(1, 10, "a"))
    race {
      DeltaWrite.append(spark, table, rows(101, 120, "b"))
    } {
      DeltaWrite.append(spark, table, rows(201, 210, "c"))
    }
    val withIds = DeltaLog.readWithRowIds(spark, table)
      .select("_row_id").collect().map(_.getLong(0))
    assert(withIds.length == 40)
    assert(withIds.distinct.length == 40, "stable row ids must never collide")
    assert(DeltaLog.verifyChecksum(spark, table, None))
  }

  test("vacuum audit commits rebase over a concurrent metadata change") {
    val table = mkTable("cc-vacuum")
    DeltaWrite.append(spark, table, rows(1, 10, "a").repartition(2))
    DeltaWrite.compact(spark, table, targetFileBytes = 1L << 30)
    race {
      DeltaWrite.setProperties(spark, table, Map("graft.note" -> "x"))
    } {
      DeltaWrite.vacuum(spark, table, retainMs = 0L)
    }
    assert(ids(table) == (1L to 10L).toSet)
    val ops = DeltaWrite.history(spark, table).select("operation").collect()
      .map(_.getString(0)).toSeq
    assert(ops.contains("VACUUM START") && ops.contains("VACUUM END"))
  }

  test("threaded soak: 4 writers x 5 appends each all land; exact rows; valid chain") {
    val table = mkTable("cc-soak")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = (0 until 5).foreach { i =>
            val base = (w * 1000 + i * 100).toLong
            DeltaWrite.append(spark, table, rows(base + 1, base + 10, s"w$w"))
          }
        })
      }
      futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val snap = DeltaLog.snapshot(spark, table)
    assert(snap.version == 20L, s"expected 20 data commits, got ${snap.version}")
    val expected = (for (w <- 0 until 4; i <- 0 until 5; d <- 1 to 10)
      yield (w * 1000 + i * 100 + d).toLong).toSet
    assert(ids(table) == expected)
    assert(DeltaLog.verifyChecksum(spark, table, None))
  }
}
