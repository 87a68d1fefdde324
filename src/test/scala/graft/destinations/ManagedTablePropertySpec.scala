package graft.destinations

import graft.SparkSpec
import graft.config.{Location, ReplaceCondition, Types}
import org.apache.spark.sql.types._
import scala.util.Random

/** Property test: random append/upsert/replace sequences applied to a
  * managed table must match a trivially-correct in-memory model of the
  * same semantics (matched keys replaced, predicate delete + insert).
  */
class ManagedTablePropertySpec extends SparkSpec {
  import spark.implicits._

  private val schema = Seq(
    Types.FieldSpec("k", LongType),
    Types.FieldSpec("tag", StringType),
    Types.FieldSpec("v", LongType))

  test("random op sequences: table state == model state (20 scenarios)") {
    (1 to 20).foreach { scenario =>
      val rnd = new Random(scenario)
      val loc = Location(tmpDir(s"mt-prop-$scenario").resolve("tbl").toString)
      ManagedTable.createIfAbsent(spark, loc, schema, Nil, Map.empty)
      // model: key -> (tag, v); keys are unique by construction of ops
      var model = Map.empty[Long, (String, Long)]

      def randRows(n: Int): Seq[(Long, String, Long)] = {
        val keys = rnd.shuffle((0L until 30L).toList).take(n)
        keys.map(k => (k, s"t${rnd.nextInt(3)}", rnd.nextLong(1000)))
      }

      (1 to 5).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => // append rows with keys NOT in the model (appends must not dupe)
            val rows = randRows(rnd.nextInt(5) + 1).filterNot(r => model.contains(r._1))
            if (rows.nonEmpty) {
              ManagedTable.append(spark, loc, rows.toDF("k", "tag", "v"))
              model ++= rows.map(r => r._1 -> (r._2, r._3))
            }
          case 1 => // upsert on k
            val rows = randRows(rnd.nextInt(6) + 1)
            ManagedTable.upsert(spark, loc, rows.toDF("k", "tag", "v"), Seq("k"))
            model ++= rows.map(r => r._1 -> (r._2, r._3))
          case 2 => // replace all rows with a given tag
            val tag = s"t${rnd.nextInt(3)}"
            val rows = randRows(rnd.nextInt(4) + 1)
              .map(r => (r._1, tag, r._3))
              .filterNot { r => // inserted keys must not collide with surviving rows
                model.get(r._1).exists(_._1 != tag)
              }.distinctBy(_._1)
            ManagedTable.replace(spark, loc, rows.toDF("k", "tag", "v"),
              Seq(ReplaceCondition("tag", tag)))
            model = model.filterNot { case (_, (t, _)) => t == tag } ++
              rows.map(r => r._1 -> (r._2, r._3))
        }
      }

      val got = ManagedTable.read(spark, loc).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got == model, s"scenario $scenario diverged: got=$got model=$model")
    }
  }
}
