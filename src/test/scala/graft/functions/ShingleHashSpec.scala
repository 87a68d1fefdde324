package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r18 fused shingle→hash expressions bit-equal to the composed
  * form they replace in the jaccard miners: every emitted long must equal
  * `xxhash64(<shingle string>)` (XXH64, seed 42) over exactly the
  * [[WordShingles]]/[[CharShingles]] distinct window strings — including
  * multi-byte UTF-8, supplementary-plane codepoints, irregular whitespace
  * and sub-window-length documents.
  */
class ShingleHashSpec extends SparkSpec {

  private val nasty = Seq(
    "the quick brown fox jumps over the lazy dog",
    "  leading   and\ttrailing\nwhitespace  runs  here  ",
    "héllo wörld ünïcode tokens répeat répeat répeat tokens",
    "emoji 😀😀 mixed 𐍈 astral 𐍈 plane text here and here again",
    "short",
    "",
    "a b a b a b a b a b",
    "五月雨を あつめて早し 最上川 五月雨を あつめて早し",
    "x " * 50 + "y")

  test("word shingle hashes equal xxhash64 over the word shingle strings") {
    import spark.implicits._
    for (n <- Seq(1, 3, 8)) {
      val df = nasty.toDF("t")
      val viaStrings = df
        .select(explode_outer(WordShingles(lower(col("t")), n)).as("s"))
        .filter(col("s").isNotNull)
        .select(xxhash64(col("s")).as("h"))
        .as[Long].collect().toSeq
      val fused = df
        .select(explode_outer(WordShingleHashes64(lower(col("t")), n)).as("h"))
        .filter(col("h").isNotNull)
        .as[Long].collect().toSeq
      assert(fused === viaStrings, s"word n=$n")
    }
  }

  test("char shingle hashes equal xxhash64 over the char shingle strings") {
    import spark.implicits._
    for ((n, stride) <- Seq((3, 1), (8, 4), (5, 2))) {
      val df = nasty.toDF("t")
      val viaStrings = df
        .select(explode_outer(CharShingles(lower(col("t")), n, stride)).as("s"))
        .filter(col("s").isNotNull)
        .select(xxhash64(col("s")).as("h"))
        .as[Long].collect().toSeq
      val fused = df
        .select(explode_outer(CharShingleHashes64(lower(col("t")), n, stride)).as("h"))
        .filter(col("h").isNotNull)
        .as[Long].collect().toSeq
      assert(fused === viaStrings, s"char n=$n stride=$stride")
    }
  }

  test("interpreted eval agrees with the codegen path") {
    val w = WordShingleHashes64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString("a bb ccc a bb"),
        org.apache.spark.sql.types.StringType), 2)
    val viaEval = w.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    assert(viaEval.nonEmpty && viaEval.distinct === viaEval)
  }
}
