package graft.destinations

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.sources.DeltaLog
import DeltaWrite.MergeClause

/** Full MERGE INTO surface ([[DeltaWrite.merge]]): multi-clause
  * first-match-wins precedence, conditional UPDATE/DELETE/INSERT,
  * NOT MATCHED BY SOURCE, the multiple-match cardinality rule, per-clause
  * CDF, row-id preservation, and the insert-only concurrency posture.
  */
class MergeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("n", LongType)))

  private def mkTable(name: String, props: Map[String, String] = Map.empty): String = {
    val t = tmpDir(name).resolve("t").toString
    DeltaWrite.createIfAbsent(spark, t, schema, properties = props)
    t
  }

  private def rows(data: (Long, String, Long)*) = {
    import spark.implicits._
    data.toDF("id", "v", "n")
  }

  private def state(t: String): Set[(Long, String, Long)] =
    DeltaLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("three-clause merge: conditional update, conditional delete, insert") {
    val t = mkTable("mg-basic")
    DeltaWrite.append(spark, t, rows((1, "a", 10), (2, "b", 20), (3, "c", 30)))
    DeltaWrite.merge(spark, t,
      source = rows((1, "A", 0), (2, "B", 0), (9, "I", 90)),
      condition = "t.id = s.id",
      matched = Seq(
        MergeClause.Delete(Some("t.n >= 20")),              // kills id=2
        MergeClause.Update(None, Map("v" -> "s.v", "n" -> "t.n + 1"))), // id=1
      notMatched = Seq(
        MergeClause.Insert(None, Map("id" -> "s.id", "v" -> "s.v", "n" -> "s.n"))))
    assert(state(t) == Set((1L, "A", 11L), (3L, "c", 30L), (9L, "I", 90L)))
  }

  test("first-match-wins: clause order decides, later clauses never fire") {
    val t = mkTable("mg-precedence")
    DeltaWrite.append(spark, t, rows((1, "a", 10)))
    // both clauses' conditions hold for id=1; the FIRST wins (update)
    DeltaWrite.merge(spark, t,
      source = rows((1, "X", 0)),
      condition = "t.id = s.id",
      matched = Seq(
        MergeClause.Update(Some("t.n > 0"), Map("v" -> "'first'")),
        MergeClause.Delete(None)))
    assert(state(t) == Set((1L, "first", 10L)))
    // flipped order: delete wins
    val t2 = mkTable("mg-precedence2")
    DeltaWrite.append(spark, t2, rows((1, "a", 10)))
    DeltaWrite.merge(spark, t2,
      source = rows((1, "X", 0)),
      condition = "t.id = s.id",
      matched = Seq(
        MergeClause.Delete(Some("t.n > 0")),
        MergeClause.Update(None, Map("v" -> "'second'"))))
    assert(state(t2) == Set.empty[(Long, String, Long)])
  }

  test("unconditioned non-final clause refuses (unreachable clauses)") {
    val t = mkTable("mg-unreachable")
    DeltaWrite.append(spark, t, rows((1, "a", 10)))
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.merge(spark, t, rows((1, "X", 0)), "t.id = s.id",
        matched = Seq(
          MergeClause.Update(None, Map("v" -> "s.v")),
          MergeClause.Delete(Some("t.n > 5"))))
    }
    assert(e.getMessage.contains("unreachable"), e.getMessage)
  }

  test("NOT MATCHED BY SOURCE: conditional update and delete of source-less rows") {
    val t = mkTable("mg-nmbs")
    DeltaWrite.append(spark, t, rows((1, "a", 10), (2, "b", 20), (3, "c", 30)))
    // source covers only id=1; id=2 (n=20) deletes, id=3 (n=30) flags stale
    DeltaWrite.merge(spark, t,
      source = rows((1, "A", 0)),
      condition = "t.id = s.id",
      matched = Seq(MergeClause.Update(None, Map("v" -> "s.v"))),
      notMatchedBySource = Seq(
        MergeClause.SourceDelete(Some("t.n <= 20")),
        MergeClause.SourceUpdate(None, Map("v" -> "'stale'"))))
    assert(state(t) == Set((1L, "A", 10L), (3L, "stale", 30L)))
  }

  test("cardinality rule: multiple source rows matching one target row abort") {
    val t = mkTable("mg-cardinality")
    DeltaWrite.append(spark, t, rows((1, "a", 10)))
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.merge(spark, t,
        source = rows((1, "X", 0), (1, "Y", 0)),
        condition = "t.id = s.id",
        matched = Seq(MergeClause.Update(None, Map("v" -> "s.v"))))
    }
    assert(e.getMessage.contains("multiple source rows"), e.getMessage)
    // insert-duplicates without matched clauses are allowed (no ambiguity)
    DeltaWrite.merge(spark, t,
      source = rows((7, "X", 1), (7, "Y", 2)),
      condition = "t.id = s.id",
      notMatched = Seq(MergeClause.Insert(None,
        Map("id" -> "s.id", "v" -> "s.v", "n" -> "s.n"))))
    assert(state(t).count(_._1 == 7L) == 2)
  }

  test("conditional insert: only rows passing the clause condition land; others drop") {
    val t = mkTable("mg-condins")
    DeltaWrite.append(spark, t, rows((1, "a", 10)))
    DeltaWrite.merge(spark, t,
      source = rows((8, "big", 100), (9, "small", 1)),
      condition = "t.id = s.id",
      notMatched = Seq(
        MergeClause.Insert(Some("s.n >= 50"),
          Map("id" -> "s.id", "v" -> "concat(s.v, '!')", "n" -> "s.n"))))
    assert(state(t) == Set((1L, "a", 10L), (8L, "big!", 100L)))
  }

  test("untouched files are not rewritten; only hit files are removed") {
    val t = mkTable("mg-pruning")
    DeltaWrite.append(spark, t, rows((1, "a", 10)).repartition(1))   // v1
    DeltaWrite.append(spark, t, rows((1000, "z", 99)).repartition(1)) // v2
    val before = DeltaLog.snapshot(spark, t).files.map(_.path).toSet
    DeltaWrite.merge(spark, t,
      source = rows((1000, "Z", 0)),
      condition = "t.id = s.id",
      matched = Seq(MergeClause.Update(None, Map("v" -> "s.v"))))
    val after = DeltaLog.snapshot(spark, t).files.map(_.path).toSet
    // the low-key file survives untouched; only the hit file was replaced
    assert((before intersect after).size == 1, s"$before vs $after")
    assert(state(t) == Set((1L, "a", 10L), (1000L, "Z", 99L)))
  }

  test("CDF: per-clause update_pre/postimage, delete, insert rows") {
    val t = mkTable("mg-cdf", props = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, t, rows((1, "a", 10), (2, "b", 20), (3, "c", 30)))
    val v = DeltaWrite.merge(spark, t,
      source = rows((1, "A", 0), (2, "B", 0), (9, "I", 90)),
      condition = "t.id = s.id",
      matched = Seq(
        MergeClause.Delete(Some("t.n >= 20")),
        MergeClause.Update(None, Map("v" -> "s.v"))),
      notMatched = Seq(MergeClause.Insert(None,
        Map("id" -> "s.id", "v" -> "s.v", "n" -> "s.n"))),
      notMatchedBySource = Seq(MergeClause.SourceUpdate(None, Map("v" -> "'stale'"))))
    val cdf = DeltaLog.readCdf(spark, t, v - 1, Some(v))
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(cdf == Set(
      (1L, "a", "update_preimage"), (1L, "A", "update_postimage"),
      (2L, "b", "delete"),
      (3L, "c", "update_preimage"), (3L, "stale", "update_postimage"),
      (9L, "I", "insert")), cdf)
  }

  test("row tracking: updates inherit row ids, copies keep them, inserts mint fresh") {
    val t = mkTable("mg-rowids", props = Map("delta.enableRowTracking" -> "true"))
    DeltaWrite.append(spark, t, rows((1, "a", 10), (2, "b", 20)).repartition(1))
    val idsBefore = DeltaLog.readWithRowIds(spark, t)
      .select("id", "_row_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    DeltaWrite.merge(spark, t,
      source = rows((1, "A", 0), (9, "I", 90)),
      condition = "t.id = s.id",
      matched = Seq(MergeClause.Update(None, Map("v" -> "s.v"))),
      notMatched = Seq(MergeClause.Insert(None,
        Map("id" -> "s.id", "v" -> "s.v", "n" -> "s.n"))))
    val after = DeltaLog.readWithRowIds(spark, t)
      .select("id", "_row_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after(1L) == idsBefore(1L), "updated row must inherit its stable id")
    assert(after(2L) == idsBefore(2L), "copied row must keep its stable id")
    assert(!idsBefore.values.toSet.contains(after(9L)), "insert must mint a fresh id")
  }

  test("schema evolution: new SET/INSERT columns widen the table; old rows null-fill") {
    val t = mkTable("mg-evolve")
    DeltaWrite.append(spark, t, rows((1, "a", 10), (2, "b", 20)))
    // without the flag: refuse loudly
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.merge(spark, t, rows((1, "A", 0)), "t.id = s.id",
        matched = Seq(MergeClause.Update(None, Map("tag" -> "s.v"))))
    }
    assert(e.getMessage.contains("mergeSchema"), e.getMessage)
    // with it: `tag` (string, from s.v) and `score` (long) join the schema
    DeltaWrite.merge(spark, t,
      source = rows((1, "A", 7), (9, "I", 90)),
      condition = "t.id = s.id",
      matched = Seq(MergeClause.Update(None,
        Map("v" -> "s.v", "tag" -> "upper(s.v)", "score" -> "s.n * 2"))),
      notMatched = Seq(MergeClause.Insert(None,
        Map("id" -> "s.id", "v" -> "s.v", "n" -> "s.n", "tag" -> "s.v"))),
      mergeSchema = true)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "n", "tag", "score"))
    val got = DeltaLog.read(spark, t)
      .select("id", "v", "tag", "score").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == Set(
      (1L, "A", Some("A"), Some(14L)),   // updated: both new cols set
      (2L, "b", None, None),             // untouched-file row: null-filled
      (9L, "I", Some("I"), None)))       // inserted: tag set, score absent
    // an expression needing TARGET columns cannot define a new column
    val e2 = intercept[IllegalArgumentException] {
      DeltaWrite.merge(spark, t, rows((1, "x", 0)), "t.id = s.id",
        matched = Seq(MergeClause.Update(None, Map("other" -> "t.v"))),
        mergeSchema = true)
    }
    assert(e2.getMessage.contains("source alone"), e2.getMessage)
  }

  test("schema evolution on a CDF table: change rows carry the evolved column") {
    val t = mkTable("mg-evolve-cdf", props = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, t, rows((1, "a", 10)))
    val v = DeltaWrite.merge(spark, t,
      source = rows((1, "A", 7), (9, "I", 90)),
      condition = "t.id = s.id",
      matched = Seq(MergeClause.Update(None, Map("tag" -> "upper(s.v)"))),
      notMatched = Seq(MergeClause.Insert(None,
        Map("id" -> "s.id", "v" -> "s.v", "tag" -> "s.v"))),
      mergeSchema = true)
    val cdf = DeltaLog.readCdf(spark, t, v - 1, Some(v))
      .select("id", "tag", "_change_type").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(cdf == Set(
      (1L, None, "update_preimage"),      // pre-image: column did not exist
      (1L, Some("A"), "update_postimage"),
      (9L, Some("I"), "insert")), cdf)
  }

  test("UPDATE: predicate-pruned rewrite, CDF pre/postimages, untouched files intact") {
    val t = mkTable("mg-update", props = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWrite.append(spark, t, rows((1, "a", 10), (2, "b", 20)).repartition(1))
    DeltaWrite.append(spark, t, rows((1000, "z", 99)).repartition(1))
    val before = DeltaLog.snapshot(spark, t).files.map(_.path).toSet
    val v = DeltaWrite.update(spark, t, "n >= 20 AND id < 100",
      Map("v" -> "concat(v, '+')", "n" -> "n * 10"))
    assert(state(t) == Set((1L, "a", 10L), (2L, "b+", 200L), (1000L, "z", 99L)))
    // stats pruning: the high-key file cannot match id < 100 — untouched
    val after = DeltaLog.snapshot(spark, t).files.map(_.path).toSet
    assert((before intersect after).size == 1, s"$before vs $after")
    // history records the op as UPDATE; CDF carries pre/postimages
    val hist = DeltaWrite.history(spark, t).filter(col("version") === v)
      .select("operation").head().getString(0)
    assert(hist == "UPDATE")
    val cdf = DeltaLog.readCdf(spark, t, v - 1, Some(v))
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(cdf == Set(
      (2L, "b", "update_preimage"), (2L, "b+", "update_postimage")), cdf)
    // no-match update commits nothing
    assert(DeltaWrite.update(spark, t, "id = -5", Map("v" -> "'x'")) == v)
  }

  test("insert-only merge races a whole-table reader: loser aborts (non-blind adds)") {
    val t = mkTable("mg-concurrency")
    DeltaWrite.append(spark, t, rows((1, "a", 10)))
    val e = intercept[Concurrency.ConflictException] {
      DeltaWrite.racePublishHook = Some((_, _) =>
        DeltaWrite.merge(spark, t, rows((50, "w", 0)), "t.id = s.id",
          notMatched = Seq(MergeClause.Insert(None,
            Map("id" -> "s.id", "v" -> "s.v", "n" -> "s.n")))))
      try DeltaWrite.merge(spark, t, rows((50, "l", 0)), "t.id = s.id",
        notMatched = Seq(MergeClause.Insert(None,
          Map("id" -> "s.id", "v" -> "s.v", "n" -> "s.n"))))
      finally DeltaWrite.racePublishHook = None
    }
    assert(e.getMessage.contains("concurrent rewrite added files"), e.getMessage)
    assert(state(t).count(_._1 == 50L) == 1, "no duplicate-key anomaly")
  }
}
