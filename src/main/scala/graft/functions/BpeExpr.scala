package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encoding with an arbitrarily large merge table.
  *
  * The composed form (a per-word `replace` chain over the ␟-delimited
  * encoding, one call per merge) is exact but its expression tree grows
  * linearly with the merge count — fine for the ≤64-merge training demos,
  * unusable for a production tokenizer's tens of thousands of merges. This
  * expression carries the WHOLE rank-ordered merge table as one reference
  * object (shipped with the serialized plan exactly once, like a broadcast
  * dict), so the plan tree and generated code stay O(1) in table size.
  *
  * Semantics are identical to the chained form and the DuckDB oracle's
  * replay: whitespace-split words (empty tokens dropped), each word starts
  * as its codepoint sequence, merges apply IN RANK ORDER, each one a greedy
  * left-to-right non-overlapping merge of adjacent pair (a, b) — Sennrich's
  * sequential apply_bpe. The document's token stream is the concatenation
  * over its words. Lowercasing is the CALLER's job (pass `lower(col)`),
  * matching the CharShingles convention.
  */
final class BpeMergeTable(pairs: Array[(String, String)]) extends Serializable {

  /** Pairs that can never fire (a or b longer than any buildable token
    * would be scanned uselessly; we keep it simple: scan with a presence
    * set — see [[encodeWord]]). Kept in rank order.
    */
  private val a: Array[String] = pairs.map(_._1)
  private val b: Array[String] = pairs.map(_._2)
  private val merged: Array[String] = pairs.map(p => p._1 + p._2)

  def size: Int = a.length

  /** Encode one word: codepoint tokens, then merges in rank order. The
    * presence set skips merges whose halves aren't both in the word's
    * current token multiset — O(1) per skipped merge, so a 50k-entry table
    * costs ~50k hash probes per word plus a scan only for the handful of
    * merges that can actually fire (each firing shrinks the token count,
    * so at most len-1 merges ever do).
    */
  def encodeWord(word: String, out: java.util.ArrayList[Any]): Unit = {
    val n = word.codePointCount(0, word.length)
    if (n == 0) return
    var toks = new Array[String](n)
    var i = 0
    var cp = 0
    val present = new java.util.HashSet[String](n * 2)
    while (cp < n) {
      val next = word.offsetByCodePoints(i, 1)
      toks(cp) = word.substring(i, next)
      present.add(toks(cp))
      i = next
      cp += 1
    }
    var len = n
    var m = 0
    while (m < a.length && len > 1) {
      if (present.contains(a(m)) && present.contains(b(m))) {
        var r = 0 // read
        var w = 0 // write
        var fired = false
        while (r < len) {
          if (r + 1 < len && toks(r) == a(m) && toks(r + 1) == b(m)) {
            toks(w) = merged(m); fired = true; r += 2
          } else {
            toks(w) = toks(r); r += 1
          }
          w += 1
        }
        if (fired) {
          len = w
          present.add(merged(m))
          // stale a/b entries may linger in `present` if fully consumed —
          // a skipped-scan miss later, never a correctness issue
        }
      }
      m += 1
    }
    i = 0
    while (i < len) { out.add(UTF8String.fromString(toks(i))); i += 1 }
  }

  /** Whole-document encode: whitespace words in order, tokens concatenated. */
  def encode(text: UTF8String): ArrayData = {
    val words = ShingleUtil.Whitespace.split(text.toString)
    val out = new java.util.ArrayList[Any](words.length * 4)
    var i = 0
    while (i < words.length) {
      if (!words(i).isEmpty) encodeWord(words(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  @transient private lazy val table = new BpeMergeTable(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  // the merge table must not be printed into plan strings / tree hashes
  override def flatArguments: Iterator[Any] = Iterator(child)
  override def toString: String = s"bpe_encode($child, ${merges.size} merges)"

  override def nullSafeEval(input: Any): Any =
    table.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  /** DataFrame-API entry: `BpeEncodeExpr(lower(col("text")), merges)` with
    * `merges` in rank order.
    */
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    GraftShims.column(BpeEncodeExpr(GraftShims.expression(c), merges))
}
