package graft.ops

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class LinesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "accept cookies\nunique line one\nall rights reserved"),
    (2L, "accept cookies\nsecond doc body\nall rights reserved"),
    (3L, "accept cookies\nthird doc text\nall rights reserved"),
    (4L, "nothing shared here\nat all"),
    (5L, "accept cookies\nall rights reserved") // would drop to empty
  ).toDF("doc_id", "text")

  test("dropCommonLines removes lines above the doc-frequency cap, keeps order") {
    val r = Lines.dropCommonLines(docs, "doc_id", "text", maxDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[String]("text") == "unique line one")
    assert(r(0).getAs[Int]("n_lines") == 3 && r(0).getAs[Long]("n_kept") == 1L)
    assert(r(3).getAs[String]("text") == "nothing shared here\nat all")
    assert(r(3).getAs[Long]("n_kept") == 2L)
    // doc 5 loses every line but stays present with empty text
    assert(r(4).getAs[String]("text") == "" && r(4).getAs[Long]("n_kept") == 0L)
  }

  test("dropCommonLines is the identity when no line is common") {
    val solo = Seq((9L, "a\nb\nc")).toDF("doc_id", "text")
    val r = Lines.dropCommonLines(solo, "doc_id", "text", maxDocFreq = 1).head()
    assert(r.getAs[String]("text") == "a\nb\nc" && r.getAs[Long]("n_kept") == 3L)
  }

  test("dropCommonLines normalize=true keys on lower(trim) but keeps original bytes") {
    val d = Seq(
      (1L, "  Accept Cookies  \nbody one"),
      (2L, "accept cookies\nbody two"),
      (3L, "ACCEPT COOKIES\nbody three")).toDF("doc_id", "text")
    val r = Lines.dropCommonLines(d, "doc_id", "text", maxDocFreq = 2, normalize = true)
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[String]("text")).toSeq == Seq("body one", "body two", "body three"))
    // without normalization the three variants are distinct lines: nothing dropped
    val raw = Lines.dropCommonLines(d, "doc_id", "text", maxDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(raw.forall(_.getAs[Long]("n_kept") == 2L))
  }

  test("Text.piiRedact / piiCounts over all three classes, chain order safe") {
    val r = Seq("mail bob.smith+x@corp.example.org or 10.0.42.7 call 555-867-5309 done")
      .toDF("t")
      .select(Text.piiCounts(col("t")).as("c"), Text.piiRedact(col("t")).as("r"))
      .head()
    val c = r.getStruct(0)
    assert(c.getAs[Int]("n_email") == 1 && c.getAs[Int]("n_ipv4") == 1 && c.getAs[Int]("n_phone") == 1)
    assert(r.getString(1) == "mail <EMAIL> or <IP> call <PHONE> done")
    // no PII: identity
    val clean = Seq("plain text with no sensitive content at all").toDF("t")
      .select(Text.piiRedact(col("t"))).head().getString(0)
    assert(clean == "plain text with no sensitive content at all")
  }

  test("Dedup.exactNewOnlyBloom equals exactNewOnly exactly") {
    val corpus = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val incoming = Seq(
      (10L, "alpha"),  // dup — must be dropped
      (11L, "delta"),  // new
      (12L, "beta"),   // dup
      (13L, "epsilon") // new
    ).toDF("id", "text")
    val plain = Dedup.exactNewOnly(incoming, corpus, "text")
      .select("id").as[Long].collect().sorted
    val bloom = Dedup.exactNewOnlyBloom(incoming, corpus, "text", expectedItems = 100L)
      .select("id").as[Long].collect().sorted
    assert(plain.toSeq == Seq(11L, 13L))
    assert(bloom.toSeq == plain.toSeq)
  }
}
