package graft.destinations

import graft.SparkSpec
import graft.sources.DeltaLog
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Randomized CDF conformance: a seeded sequence of append / upsert /
  * delete / overwrite operations runs against BOTH a real Delta table and
  * an in-memory reference model. The model independently predicts every
  * commit's change set (pre/post images for updates, deletes, inserts,
  * derivation for appends/overwrites); `readCdf` must reproduce it
  * version-for-version, and the final table state must equal the model —
  * the property that matters for CDF: the change stream REPLAYS to the
  * table.
  */
class DeltaCdfPropertySpec extends SparkSpec {
  import spark.implicits._

  private type Change = (Long, String, String) // id, v, _change_type

  test("random op sequences: readCdf matches the reference model per version") {
    val rnd = new scala.util.Random(1234)
    val table = tmpDir("dw-cdf-prop").toString
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    DeltaWrite.createIfAbsent(spark, table, schema,
      properties = Map("delta.enableChangeDataFeed" -> "true"))

    val model = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    val expected = scala.collection.mutable.Map.empty[Long, Set[Change]] // version → changes
    var nextId = 1L

    def df(rows: Seq[(Long, String)]) = rows.toDF("id", "v")

    (1 to 12).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // append fresh ids
          val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
            val id = nextId; nextId += 1; (id, s"a$step-$id")
          }
          val v = DeltaWrite.append(spark, table, df(rows))
          rows.foreach { case (id, s) => model(id) = s }
          expected(v) = rows.map { case (id, s) => (id, s, "insert") }.toSet
        case 1 => // upsert: some existing keys + some fresh
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
          val fresh = (0 until 1 + rnd.nextInt(2)).map { _ =>
            val id = nextId; nextId += 1; id
          }
          val rows = existing.map(id => (id, s"u$step-$id")) ++
            fresh.map(id => (id, s"n$step-$id"))
          val v = DeltaWrite.upsert(spark, table, df(rows), Seq("id"))
          val changes = Set.newBuilder[Change]
          existing.foreach { id =>
            changes += ((id, model(id), "update_preimage"))
            changes += ((id, s"u$step-$id", "update_postimage"))
          }
          fresh.foreach(id => changes += ((id, s"n$step-$id", "insert")))
          rows.foreach { case (id, s) => model(id) = s }
          expected(v) = changes.result()
        case 2 => // delete a residue class
          val k = 2 + rnd.nextInt(3)
          val r = rnd.nextInt(k)
          val hit = model.filter { case (id, _) => id % k == r }.toSeq
          val before = DeltaLog.snapshot(spark, table).version
          val v = DeltaWrite.delete(spark, table, s"id % $k = $r")
          if (hit.isEmpty) assert(v == before, "no-match delete must not commit")
          else {
            hit.foreach { case (id, _) => model.remove(id) }
            expected(v) = hit.map { case (id, s) => (id, s, "delete") }.toSet
          }
        case 3 => // full overwrite (derivation mode)
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1; (id, s"o$step-$id")
          }
          val old = model.toSeq
          val v = DeltaWrite.overwrite(spark, table, df(rows))
          model.clear(); rows.foreach { case (id, s) => model(id) = s }
          expected(v) = (old.map { case (id, s) => (id, s, "delete") } ++
            rows.map { case (id, s) => (id, s, "insert") }).toSet
      }
    }

    // final state replays
    val state = DeltaLog.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == model.toMap)

    // the change stream matches the model per version
    val byVersion = DeltaLog.readCdf(spark, table, 0L).collect()
      .groupBy(_.getAs[Long]("_commit_version"))
      .view.mapValues(_.map(r =>
        (r.getLong(0), r.getString(1), r.getAs[String]("_change_type"))).toSet)
      .toMap
    assert(byVersion.keySet == expected.keySet,
      s"versions ${byVersion.keySet} vs expected ${expected.keySet}")
    expected.foreach { case (v, want) =>
      assert(byVersion(v) == want, s"version $v: got ${byVersion(v)}, want $want")
    }

    // and the stream REPLAYS to the final state from empty
    val replayed = scala.collection.mutable.Map.empty[Long, String]
    expected.keys.toSeq.sorted.foreach { v =>
      expected(v).foreach {
        case (id, _, "delete") => replayed.remove(id)
        case (id, _, "update_preimage") => () // postimage carries the value
        case (id, s, _) => replayed(id) = s
      }
    }
    assert(replayed.toMap == model.toMap)
  }
}
