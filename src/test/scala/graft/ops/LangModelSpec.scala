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
}
