package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style equivalence tests for the prefix-filtered pair miners:
  * on seeded random corpora, the PPJoin candidate path (frequency-ordered
  * prefixes + length/positional bounds + merge verify) must emit EXACTLY
  * the brute-force all-pairs jaccard result — completeness is the part a
  * subtle epsilon or bound error would silently break.
  */
class PairMinerPropertySpec extends SparkSpec {
  import spark.implicits._

  private def wordSet(text: String, n: Int): Set[String] = {
    val ws = text.trim.split("\\s+").filter(_.nonEmpty)
    if (ws.length < n) Set.empty
    else ws.sliding(n).map(_.mkString(" ")).toSet
  }

  private def brutePairs(docs: Seq[(Long, String)], n: Int, t: Double): Set[(Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = wordSet(ta, n); sb = wordSet(tb, n)
      if sa.nonEmpty && sb.nonEmpty
      common = (sa & sb).size
      if common.toDouble / (sa.size + sb.size - common) >= t
    } yield (ia, ib)).toSet

  private def randomCorpus(seed: Int, ndocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    // clusters of mutated copies: guarantees pairs across the threshold range
    val bases = Seq.fill(ndocs / 4)(Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
    (0 until ndocs).map { i =>
      val base = bases(rnd.nextInt(bases.size))
      val mutated = base.map(w =>
        if (rnd.nextDouble() < 0.25) vocab(rnd.nextInt(vocab.size)) else w)
      (i.toLong, mutated.mkString(" "))
    }
  }

  test("ngramJaccardPairs equals brute force over seeds and thresholds") {
    for (seed <- Seq(1, 2, 3); t <- Seq(0.3, 0.5, 0.8)) {
      val corpus = randomCorpus(seed, 40)
      val df = corpus.toDF("doc_id", "text")
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 2, threshold = t,
          maxShingleDocFreq = CapSpec.Off)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = brutePairs(corpus, 2, t)
      assert(got == want, s"seed=$seed t=$t missing=${want -- got} extra=${got -- want}")
    }
  }

  test("ngramJaccardPairs with a stop-shingle cap equals brute force over the capped space") {
    // the cap drops shingles with doc frequency > c BEFORE profile sizing,
    // so the exact semantics are "jaccard of the capped shingle space" —
    // the brute force replicates the cut from corpus-wide doc frequencies
    for (seed <- Seq(4, 5); t <- Seq(0.3, 0.5, 0.8); c <- Seq(3L, 8L)) {
      val corpus = randomCorpus(seed, 40)
      val docFreq = corpus
        .flatMap { case (id, text) => wordSet(text, 2).map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
      def capped(text: String): Set[String] =
        wordSet(text, 2).filter(sh => docFreq(sh) <= c)
      val want = (for {
        (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
        sa = capped(ta); sb = capped(tb)
        if sa.nonEmpty && sb.nonEmpty
        common = (sa & sb).size
        if common.toDouble / (sa.size + sb.size - common) >= t
      } yield (ia, ib)).toSet
      val got = Dedup.ngramJaccardPairs(corpus.toDF("doc_id", "text"), "doc_id", "text",
          n = 2, threshold = t, maxShingleDocFreq = CapSpec.Fixed(c))
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"seed=$seed t=$t cap=$c missing=${want -- got} extra=${got -- want}")
    }
  }

  test("charJaccardPairs equals brute force (stride 1, lowercased codepoint shingles)") {
    def charSet(text: String, n: Int): Set[String] = {
      val t = text.toLowerCase
      if (t.length < n) Set.empty else t.sliding(n).toSet
    }
    for (seed <- Seq(6, 9); t <- Seq(0.3, 0.6)) {
      val corpus = randomCorpus(seed, 30)
      val want = (for {
        (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
        sa = charSet(ta, 5); sb = charSet(tb, 5)
        if sa.nonEmpty && sb.nonEmpty
        common = (sa & sb).size
        if common.toDouble / (sa.size + sb.size - common) >= t
      } yield (ia, ib)).toSet
      val got = Dedup.charJaccardPairs(corpus.toDF("doc_id", "text"), "doc_id", "text",
          n = 5, threshold = t, maxShingleDocFreq = CapSpec.Off)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"seed=$seed t=$t missing=${want -- got} extra=${got -- want}")
    }
  }

  test("ngramJaccardAgainst equals brute force across corpora") {
    val corpus = randomCorpus(7, 40)
    val (incoming, lake) = corpus.partition(_._1 >= 20)
    val t = 0.4
    val got = Dedup.ngramJaccardAgainst(
        incoming.toDF("doc_id", "text"), lake.toDF("doc_id", "text"),
        "doc_id", "text", n = 2, threshold = t, maxShingleDocFreq = CapSpec.Off)
      .select("id_in", "id_corpus").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ia, ta) <- incoming; (ib, tb) <- lake
      sa = wordSet(ta, 2); sb = wordSet(tb, 2)
      if sa.nonEmpty && sb.nonEmpty
      common = (sa & sb).size
      if common.toDouble / (sa.size + sb.size - common) >= t
    } yield (ia, ib)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("verified jaccard values are exact, not just the pair set") {
    val corpus = randomCorpus(11, 30)
    val got = Dedup.ngramJaccardPairs(corpus.toDF("doc_id", "text"), "doc_id", "text",
        n = 2, threshold = 0.3, maxShingleDocFreq = CapSpec.Off, withCounts = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getInt(3))).toMap
    got.foreach { case ((a, b), (common, union)) =>
      val sa = wordSet(corpus(a.toInt)._2, 2)
      val sb = wordSet(corpus(b.toInt)._2, 2)
      assert(common == (sa & sb).size && union == (sa | sb).size, s"($a,$b)")
    }
  }
}
