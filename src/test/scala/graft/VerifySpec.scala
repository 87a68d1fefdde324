package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The correctness dump must fail LOUDLY: a query that throws has to leave a
  * visible artifact (an `_ERROR.json` in its output slot + an entry in the
  * returned error map), never silently vanish from the round's report —
  * that silence is how the r6/r7 q47/q62 regression survived two rounds
  * behind a "all green" board.
  */
class VerifySpec extends SparkSpec {

  test("a throwing query leaves _ERROR.json and an error-map entry; good queries still dump") {
    val out = tmpDir("verify-loud").toString
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "good_query" -> ((s, _) => s.range(3).toDF("id")),
      "boom_query" -> ((_, _) => throw new IllegalStateException("deliberate failure")))
    val errors = Verify.dump(spark, qs, "unused", out)

    assert(errors.keySet == Set("boom_query"), errors.toString)
    assert(errors("boom_query").contains("deliberate failure"))

    val marker = new java.io.File(s"$out/boom_query/_ERROR.json")
    assert(marker.exists(), "failed query must write _ERROR.json in its output slot")
    val body = java.nio.file.Files.readString(marker.toPath)
    assert(body.contains("boom_query") && body.contains("deliberate failure"), body)

    // the good query's parquet is intact and readable
    assert(spark.read.parquet(s"$out/good_query").count() == 3)
  }

  test("a failure slot recovered by a later successful run is clean parquet again") {
    val out = tmpDir("verify-recover").toString
    val bad: Map[String, (SparkSession, String) => DataFrame] =
      Map("q" -> ((_, _) => throw new RuntimeException("first pass fails")))
    val good: Map[String, (SparkSession, String) => DataFrame] =
      Map("q" -> ((s, _) => s.range(2).toDF("id")))
    assert(Verify.dump(spark, bad, "unused", out).nonEmpty)
    assert(Verify.dump(spark, good, "unused", out).isEmpty)
    // overwrite replaced the slot; stale _ERROR.json must not linger
    assert(!new java.io.File(s"$out/q/_ERROR.json").exists(),
      "successful overwrite must clear the stale _ERROR.json marker")
    assert(spark.read.parquet(s"$out/q").count() == 2)
  }
}
