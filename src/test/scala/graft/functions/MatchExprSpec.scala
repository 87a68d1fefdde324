package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatchExprSpec extends SparkSpec {
  import spark.implicits._

  test("AhoCorasick finds overlapping, nested, and suffix-linked patterns") {
    val a = AhoCorasick.compile(Seq("he", "she", "his", "hers", "e"))
    assert(a.matches("ushers").toSeq == Seq(0, 1, 3, 4)) // he, she, hers, e
    assert(a.matches("this").toSeq == Seq(2))
    assert(a.matches("xyz").isEmpty)
    // single scan finds every occurrence class once (dedup)
    assert(a.matches("hehehe").toSeq == Seq(0, 4))
  }

  test("MultiContains equals the per-pattern contains() form on real-ish text") {
    val pats = Seq("ab", "bc", "abc", "cab", "zz")
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map(_ =>
      Tuple1((1 to 30).map(_ => "abcz" (rnd.nextInt(4))).mkString))
    val df = rows.toDF("t")
    val naive = pats.map(p => when(col("t").contains(p), lit(p)))
    val r = df.select(
      MultiContains(col("t"), pats).as("fast"),
      filter(array(naive: _*), x => x.isNotNull).as("slow")).collect()
    assert(r.forall(x => x.getSeq[String](0) == x.getSeq[String](1)))
  }

  test("BloomMightContain: no false negatives, stays inside codegen, null passthrough") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (1L to 500L).foreach(bf.putLong)
    val df = spark.range(1, 1000).toDF("h")
      .withColumn("maybe", BloomMightContain(col("h"), bf))
    val rows = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((1L to 500L).forall(rows(_)), "bloom false negative")
    val fp = (501L to 999L).count(rows(_))
    assert(fp < 50, s"fp rate implausibly high: $fp/499")
    val nullRow = spark.sql("SELECT CAST(NULL AS BIGINT) AS h")
      .select(BloomMightContain(col("h"), bf)).head()
    assert(nullRow.isNullAt(0))
  }

  test("MultiContains null/empty semantics and bad-pattern rejection") {
    val df = Seq(Tuple1(Option.empty[String]), Tuple1(Some("no hits here"))).toDF("t")
    val r = df.select(MultiContains(col("t"), Seq("zzz"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[String](0).isEmpty)
    intercept[IllegalArgumentException](AhoCorasick.compile(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.compile(Nil))
  }
}
