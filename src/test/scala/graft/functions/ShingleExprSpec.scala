package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",                         // shorter than shingle size
    "",                            // empty
    "  padded   with    spaces  ",
    "repeat repeat repeat repeat", // duplicate shingles → distinct
    "tabs\tand\nnewlines mixed in here")

  test("native WordShingles is result-identical to the composed expression form") {
    val df = samples.toDF("t")
    val both = df.select(
      WordShingles(col("t"), 3).as("native"),
      Text.wordShingles(col("t"), 3).as("composed"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch for: $r")
    }
  }

  test("interpreted eval path (nullSafeEval) matches too, and nulls propagate") {
    val r = spark.sql("SELECT word_shingles(NULL, 3)").head()
    assert(r.isNullAt(0))
    val arr = ShingleUtil.shingles(
      org.apache.spark.unsafe.types.UTF8String.fromString("x y z w"), 2)
    assert(arr.numElements() == 3)
  }

  test("word_shingles is registered as SQL via GraftExtensions") {
    val r = spark.sql("SELECT word_shingles('a b c d', 3) AS sh").head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    // non-literal n is rejected with a clear message
    val e = intercept[Exception](spark.sql("SELECT word_shingles('a', length('xx'))").collect())
    assert(e.getMessage.contains("integer literal"))
  }

  test("astral chars: native char/winnow expressions index codepoints like the composed forms") {
    // web corpora carry supplementary-plane characters (emoji): Spark's
    // length/substring index codepoints, so the native fast paths must
    // never split a surrogate pair. 🎉 and 😀 are U+1F389/U+1F600 (two
    // UTF-16 units each); mixed with BMP accents and ASCII.
    val astral = Seq(
      "ab🎉cd😀ef",
      "🎉🎉🎉🎉🎉🎉🎉🎉",
      "héllo 🎉 wörld 😀 mixed text here",
      "plain ascii stays on the byte path")
    val df = astral.toDF("t")
    val cs = df.select(
      CharShingles(lower(col("t")), 3, 1).as("native"),
      Text.charShingles(col("t"), 3).as("composed"))
    cs.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"char_shingles mismatch: $r")
    }
    val wn = df.select(
      WinnowFingerprints(lower(col("t")), 4, 2).as("native"),
      Text.winnowMinima(Text.positionalShingleHashes(col("t"), 4), 2).as("composed"))
    wn.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"winnow mismatch: $r")
    }
    // a shingle containing an astral char is a whole-codepoint string
    val sh = df.filter(col("t").startsWith("ab")).select(CharShingles(col("t"), 2, 1))
      .head().getSeq[String](0)
    assert(sh.contains("b🎉") && sh.contains("🎉c"), sh.toString)

    // positional 64-bit window hashes: element i must be md5-upper-64 of
    // the window at codepoint i — surrogate pairs intact, ASCII byte path
    // and astral codepoint path agreeing with a driver-side reference
    astral.foreach { s =>
      val t = s.toLowerCase
      val cps = t.codePoints().toArray
      val expect = (0 to cps.length - 4).map { i =>
        val w = new String(cps, i, 4)
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        java.nio.ByteBuffer.wrap(d, 0, 8).getLong
      }
      val got = Seq(s).toDF("t")
        .select(PositionalHashes64(lower(col("t")), 4)).head().getSeq[Long](0)
      assert(got == expect, s"positional_hashes64 mismatch on '$s'")
    }
  }

  test("codegen path executes (expression inside a wholestage-codegen'd project)") {
    val df = samples.toDF("t").repartition(2)
      .select(explode(WordShingles(lower(col("t")), 2)).as("g"))
      .groupBy("g").count()
    assert(df.collect().map(_.getLong(1)).sum > 0)
  }
}
