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

  test("MultiContains null/empty semantics and bad-pattern rejection") {
    val df = Seq(Tuple1(Option.empty[String]), Tuple1(Some("no hits here"))).toDF("t")
    val r = df.select(MultiContains(col("t"), Seq("zzz"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[String](0).isEmpty)
    intercept[IllegalArgumentException](AhoCorasick.compile(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.compile(Nil))
  }
}
