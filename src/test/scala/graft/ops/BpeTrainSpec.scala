package graft.ops

import graft.SparkSpec

/** Pins the r18 small-vocabulary driver BPE training identical to the
  * distributed iteration loop (`graft.bpe.driverTrainMaxVocab = 0` forces
  * the distributed path): same merges, same ranks, same counts — including
  * tie-heavy corpora where the (count desc, (a,b) byte-order) argmax is
  * what distinguishes implementations, and non-ASCII words.
  */
class BpeTrainSpec extends SparkSpec {

  private def both(texts: Seq[String], k: Int) = {
    import spark.implicits._
    val df = texts.toDF("text")
    val driver = LangModel.bpeTrain(df, "text", k)
    spark.conf.set("graft.bpe.driverTrainMaxVocab", "0")
    val dist =
      try LangModel.bpeTrain(df, "text", k)
      finally spark.conf.unset("graft.bpe.driverTrainMaxVocab")
    (driver, dist)
  }

  test("driver and distributed training learn identical merge tables") {
    val texts = Seq(
      "low lower lowest low low lowering",
      "new newer newest new news newly",
      "widely wide wider widest wide",
      "hugging bug rug tug jug hug hugging hugged")
    val (driver, dist) = both(texts, 12)
    assert(driver === dist)
    assert(driver.size === 12)
  }

  test("tie-heavy corpus: identical argmax under the byte-order tie-break") {
    // every pair count equal early on — ties decide everything
    val texts = Seq("ab ba ab ba", "cd dc cd dc", "ab cd ba dc")
    val (driver, dist) = both(texts, 6)
    assert(driver === dist)
  }

  test("non-ASCII vocabulary: identical merges off the ASCII plane") {
    val texts = Seq("héllo héllo hëllo", "übung übung über", "五月 五月 五日")
    val (driver, dist) = both(texts, 8)
    assert(driver === dist)
  }

  test("early exhaustion: single-char words stop both paths at the same rank") {
    val texts = Seq("a b c a b", "c a b")
    val (driver, dist) = both(texts, 5)
    assert(driver === dist)
    assert(driver.isEmpty)
  }
}
