package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "a a b"),
    (2L, "a b c")
  ).toDF("doc_id", "text") // counts: a=3, b=2, c=1, N=6

  test("unigramTrain counts words and carries the corpus total") {
    val m = LangModel.unigramTrain(corpus, "text").collect()
      .map(r => r.getAs[String]("w") -> (r.getAs[Long]("c"), r.getAs[Long]("n_total"))).toMap
    assert(m == Map("a" -> (3L, 6L), "b" -> (2L, 6L), "c" -> (1L, 6L)))
  }

  test("unigramScore self-scoring: exact average log-prob and perplexity") {
    val lm = LangModel.unigramTrain(corpus, "text")
    val r = LangModel.unigramScore(corpus, "doc_id", "text", lm)
      .orderBy("doc_id").collect()
    // doc 1: (2*ln(3/6) + ln(2/6)) / 3
    val lp1 = (2 * math.log(3.0 / 6) + math.log(2.0 / 6)) / 3
    assert(r(0).getAs[Long]("n_tok") == 3L)
    assert(math.abs(r(0).getAs[Double]("avg_logprob") - lp1) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("ppl") - math.exp(-lp1)) < 1e-9)
    // lower-probability doc 2 has higher perplexity than doc 1
    assert(r(1).getAs[Double]("ppl") > r(0).getAs[Double]("ppl"))
  }

  test("unigramScore cross-corpus: k=0 drops OOV tokens, add-k smooths them") {
    val lm = LangModel.unigramTrain(corpus, "text")
    val fresh = Seq((10L, "a zzz")).toDF("doc_id", "text")
    val hard = LangModel.unigramScore(fresh, "doc_id", "text", lm).head()
    assert(hard.getAs[Long]("n_tok") == 1L) // zzz dropped from the average
    val smooth = LangModel.unigramScore(fresh, "doc_id", "text", lm, smoothK = 1.0).head()
    assert(smooth.getAs[Long]("n_tok") == 2L)
    // p(a) = (3+1)/(6+3), p(zzz) = 1/(6+3)
    val lp = (math.log(4.0 / 9) + math.log(1.0 / 9)) / 2
    assert(math.abs(smooth.getAs[Double]("avg_logprob") - lp) < 1e-12)
    assert(!smooth.getAs[Double]("ppl").isInfinite)
  }

  test("bpeTrain: learns the classic merges; independent reference replay agrees") {
    import spark.implicits._
    // Sennrich's running example shape: 'low'×5, 'lower'×2, 'newest'×6,
    // 'widest'×3 as repeated whitespace words
    val corpus = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val merges = LangModel.bpeTrain(df, "text", 6)
    assert(merges.size == 6)
    assert(merges.map(_.rank) == (1 to 6))

    // independent reference: plain Scala BPE trainer over (word, freq)
    def pairs(toks: Vector[String]): Seq[(String, String)] =
      toks.sliding(2).collect { case Vector(a, b) => (a, b) }.toSeq
    def mergeAll(toks: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    var vocab: Map[Vector[String], Long] =
      corpus.split("\\s+").groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.length.toLong
      }
    val expect = Seq.newBuilder[(String, String)]
    for (_ <- 1 to 6) {
      val counts = vocab.toSeq.flatMap { case (t, f) => pairs(t).map(_ -> f) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val (a, b) = counts.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head._1
      expect += ((a, b))
      vocab = vocab.toSeq.map { case (t, f) => mergeAll(t, a, b) -> f }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    assert(merges.map(m => (m.a, m.b)) == expect.result(),
      s"got ${merges.map(m => (m.a, m.b))}")

    // encode: sequential rank-order application over each word
    val enc = LangModel.bpeEncode(
      Seq((1L, "lowest low"), (2L, ""), (3L, "x")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    val t1 = enc(0).getSeq[String](1)
    // 'low' must have merged into a single token by rank order, and every
    // token concatenation reconstructs the input words
    assert(t1.mkString == "lowestlow", t1.toString)
    assert(t1.contains("low"), t1.toString)
    assert(enc(1).getSeq[String](1).isEmpty)
    assert(enc(2).getSeq[String](1) == Seq("x"))
    assert(enc(0).getInt(2) == t1.size)
  }

  test("bpe merges are greedy-exact on back-to-back pair occurrences") {
    import spark.implicits._
    // 'abab': both (a,b) occurrences are back to back — a single-separator
    // delimited replace would consume the shared boundary and leave
    // [ab, a, b]; standard BPE (and this engine) yields [ab, ab].
    // 'aaaaa': overlapping run — greedy left-to-right gives [aa, aa, a].
    val corpus = (Seq.fill(8)("abab") ++ Seq.fill(3)("aaaaa")).mkString(" ")
    val merges = LangModel.bpeTrain(Seq(corpus).toDF("text"), "text", 2)
    // rank 1: (a,b) appears 16 times (2 per 'abab' word × 8)
    assert((merges(0).a, merges(0).b, merges(0).n) == (("a", "b", 16L)), merges.toString)
    val enc = LangModel.bpeEncode(
      Seq((1L, "abab"), (2L, "aaaaa"), (3L, "ababab")).toDF("doc_id", "text"),
      "doc_id", "text", merges.take(1))
      .orderBy("doc_id").collect()
    assert(enc(0).getSeq[String](1) == Seq("ab", "ab"), enc(0).toString)
    assert(enc(1).getSeq[String](1) == Seq("a", "a", "a", "a", "a"))
    assert(enc(2).getSeq[String](1) == Seq("ab", "ab", "ab"), enc(2).toString)

    // (a,a) merge applies greedily left-to-right over the run
    val aa = LangModel.BpeMerge(1, "a", "a", 0L)
    val enc2 = LangModel.bpeEncode(
      Seq((1L, "aaaaa"), (2L, "aaaa"), (3L, "aaa")).toDF("doc_id", "text"),
      "doc_id", "text", Seq(aa))
      .orderBy("doc_id").collect()
    assert(enc2(0).getSeq[String](1) == Seq("aa", "aa", "a"), enc2(0).toString)
    assert(enc2(1).getSeq[String](1) == Seq("aa", "aa"))
    assert(enc2(2).getSeq[String](1) == Seq("aa", "a"))
  }
}
