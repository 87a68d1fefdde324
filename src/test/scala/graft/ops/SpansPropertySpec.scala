package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style equivalence tests for duplicated-substring span
  * detection: on seeded random corpora with planted shared blocks, the
  * distributed pipeline (native positional hashes → bounded-key aggregate
  * → equi-join → run merge) must emit EXACTLY the brute-force span scan,
  * for both marking modes — completeness and the canonical keep-first
  * pick are the parts a hash/merge/ordering bug would silently break.
  */
class SpansPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: count every lowercased n-window corpus-wide, mark
    * recurring positions (minus the (id,pos)-min occurrence per window
    * when keepFirst), merge runs whose gap is within the window length.
    */
  private def bruteSpans(
      docs: Seq[(Long, String)], n: Int,
      keepFirst: Boolean): Set[(Long, Long, Long, Long)] = {
    val lowered = docs.map { case (id, t) => (id, t.toLowerCase) }
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Int)]]
    lowered.foreach { case (id, t) =>
      (0 to t.length - n).foreach { i =>
        val w = t.substring(i, i + n)
        occ(w) = (id, i) :: occ.getOrElse(w, Nil)
      }
    }
    val dup = occ.filter(_._2.size >= 2)
    val canonical = dup.view.mapValues(_.minBy(identity)).toMap
    lowered.flatMap { case (id, t) =>
      val marked = (0 to t.length - n).filter { i =>
        val w = t.substring(i, i + n)
        dup.contains(w) && !(keepFirst && canonical(w) == ((id, i)))
      }
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      marked.foreach { p =>
        spans.lastOption match {
          case Some((s0, e0, k)) if p <= (e0 - (n - 1)) + n =>
            spans(spans.size - 1) = (s0, p + n - 1, k + 1)
          case _ => spans += ((p, p + n - 1, 1))
        }
      }
      spans.map { case (s0, e0, k) => (id, s0 + 1L, e0 + 1L, k.toLong) }
    }.toSet
  }

  /** Random corpora with planted duplication: shared blocks inserted into
    * several documents (cross-doc dups), occasionally twice into one
    * document (within-doc dups), embedded in random filler.
    */
  private def randomCorpus(seed: Int, ndocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    def rndText(len: Int): String =
      (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val blocks = Seq.fill(3)(rndText(25 + rnd.nextInt(20)))
    (0 until ndocs).map { i =>
      val sb = new StringBuilder(rndText(10 + rnd.nextInt(30)))
      (0 until rnd.nextInt(3)).foreach { _ =>
        sb.append(blocks(rnd.nextInt(blocks.size)))
        sb.append(rndText(5 + rnd.nextInt(20)))
      }
      (i.toLong, sb.toString)
    }
  }

  test("dupSpans equals brute force over seeds, both marking modes") {
    for (seed <- Seq(11, 12, 13); keepFirst <- Seq(false, true)) {
      val corpus = randomCorpus(seed, 30)
      val got = Spans.dupSpans(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = 20, keepFirst = keepFirst)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = bruteSpans(corpus, 20, keepFirst)
      assert(got == want,
        s"seed=$seed keepFirst=$keepFirst missing=${want -- got} extra=${got -- want}")
    }
  }

  test("removeSpans round-trips: cut text equals brute-force reconstruction") {
    val corpus = randomCorpus(14, 25)
    val df = corpus.toDF("doc_id", "text")
    val lc = df.select(col("doc_id"), lower(col("text")).as("text"))
    val spans = Spans.dupSpans(lc, "doc_id", "text", n = 20, keepFirst = true)
    val got = Spans.removeSpans(lc, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val spanSet = bruteSpans(corpus, 20, keepFirst = true)
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)).toMap
    corpus.foreach { case (id, t0) =>
      val t = t0.toLowerCase
      val covered = spanSet.getOrElse(id, Seq.empty)
        .flatMap { case (_, s, e, _) => (s to e) }.toSet
      val expect = t.zipWithIndex
        .collect { case (c, i) if !covered.contains(i + 1L) => c }.mkString
      assert(got(id)._1 == expect, s"doc $id")
      assert(got(id)._2 == (t.length - expect.length).toLong, s"doc $id n_removed")
    }
  }
}
