package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox, it was fine!",
    "  leading and trailing   ",
    "",
    "   ",
    "tabs\tand\nnewlineshere\fok\rdone",
    "der hund ist nicht mit der katze",
    "@@@ ### !!! $$$ %%% ^^^ &&& *** ((()))",
    "UPPER the THE tHe",
    "a",
    "punct.in.words: yes-indeed (really)")

  test("TextStats matches the compositional word/punct counts exactly") {
    val df = texts.toDF("t")
    val rows = df.select(
      TextStats(col("t"), Seq(Text.stopwords.values.flatten.toSeq)).as("st"),
      Text.tokenCount(col("t")).as("tc"),
      size(regexp_extract_all(col("t"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("pc"),
      length(col("t")).as("lc"),
      Text.stopwordHits(col("t"), Text.stopwords.values.flatten.toSeq).as("sh"))
      .collect()
    rows.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getInt(0) == r.getInt(3), s"n_chars vs length: $r")
      assert(st.getInt(1) == r.getInt(1), s"n_words vs tokenCount: $r")
      assert(st.getInt(2) == r.getInt(2), s"n_punct vs regexp count: $r")
      assert(st.getSeq[Int](3).head == r.getInt(4), s"hits vs stopwordHits: $r")
    }
  }

  test("TextStats: per-list hits drive langId equal to the compositional form") {
    val langs = Text.stopwords.toSeq.sortBy(_._1)
    val df = texts.toDF("t")
    val rows = df.select(
      TextStats(col("t"), langs.map(_._2)).getField("hits").as("hv"),
      array(langs.map { case (_, l) => Text.stopwordHits(col("t"), l) }: _*).as("old"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1), r.toString))
  }

  test("SQL-registered text functions match the Scala API column forms") {
    val sqlR = spark.sql(
      """SELECT quality_score('the quick brown fox and the lazy dog') AS q,
                lang_id('der hund ist nicht mit der katze') AS l,
                token_count('  a b   c ') AS t,
                dup_word_ratio('a a b b') AS r,
                sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS c""").head()
    val apiR = Seq(("x")).toDF("ignore").select(
      Text.qualityScore(lit("the quick brown fox and the lazy dog")),
      Text.langId(lit("der hund ist nicht mit der katze")),
      Text.tokenCount(lit("  a b   c ")),
      Text.dupNgramRatio(lit("a a b b"), 1)).head()
    assert(sqlR.getDouble(0) == apiR.getDouble(0))
    assert(sqlR.getString(1) == apiR.getString(1) && sqlR.getString(1) == "de")
    assert(sqlR.getInt(2) == apiR.getInt(2) && sqlR.getInt(2) == 3)
    assert(sqlR.getDouble(3) == apiR.getDouble(3) && sqlR.getDouble(3) == 0.5)
    assert(sqlR.getInt(4) == 2)
    val qz = spark.sql(
      "SELECT quantize_int8(array(1.0F, -2.0F, 0.5F)) AS z").head().getStruct(0)
    assert(qz.getSeq[Int](0) == Seq(64, -127, 32) && qz.getDouble(1) == 63.5)
  }

  test("TextStats: null text yields null struct; no lists yields empty hits") {
    val df = Seq[Option[String]](None, Some("x y")).toDF("t")
    val r = df.select(TextStats(col("t"), Seq.empty)).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getStruct(0).getSeq[Int](3).isEmpty)
    assert(r(1).getStruct(0).getInt(1) == 2)
  }
}
