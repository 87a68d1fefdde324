package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching for blocklist / policy filtering.
  *
  * The naive form — `array(patterns.map(p => contains(text, p)))` or N
  * `LIKE '%p%'` predicates — rescans every document once per pattern:
  * O(len·patterns) per row, linear blowup as the blocklist grows. The
  * classic fix is Aho–Corasick (1975, public algorithm): compile the
  * pattern set into one trie with failure links and scan each document
  * ONCE, O(len + matches), whatever the pattern count.
  *
  * Scale shape: the automaton is built once per plan from the pattern
  * literals and rides to executors as a single reference object (like the
  * PQ codebooks) — a 10k-phrase blocklist is a few MB broadcast with the
  * task, and a 100 TB corpus scan stays one pass with no join and no
  * shuffle. Matching is scan-local; the usual consumers (`filter(size=0)`
  * keep-clean, or explode for per-phrase audit counts) compose on top.
  */
object AhoCorasick {

  /** Immutable compiled automaton. Nodes are flat parallel arrays; child
    * lookup is a per-node sorted char array + binary search (pattern
    * alphabets are tiny; dense 64k tables would waste cache). */
  final class Automaton private[AhoCorasick] (
      childChars: Array[Array[Char]],
      childIds: Array[Array[Int]],
      fail: Array[Int],
      // pattern indices ending at this node (incl. via suffix links),
      // sorted ascending
      out: Array[Array[Int]]) extends Serializable {

    private def step(from: Int, c: Char): Int = {
      var s = from
      while (true) {
        val i = java.util.Arrays.binarySearch(childChars(s), c)
        if (i >= 0) return childIds(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0
    }

    /** Distinct indices of matched patterns, ascending. */
    def matches(text: String): Array[Int] = {
      val found = new java.util.TreeSet[Integer]()
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val o = out(s)
        var j = 0
        while (j < o.length) { found.add(o(j)); j += 1 }
        i += 1
      }
      val res = new Array[Int](found.size)
      val it = found.iterator()
      var k = 0
      while (it.hasNext) { res(k) = it.next(); k += 1 }
      res
    }
  }

  def compile(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty pattern set")
    require(patterns.forall(_.nonEmpty), "empty-string pattern matches everything")
    // mutable trie
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += scala.collection.mutable.TreeMap.empty[Char, Int]
          ends += scala.collection.mutable.ArrayBuffer.empty[Int]
          children.size - 1
        })
      }
      ends(s) += idx
    }
    val n = children.size
    val fail = new Array[Int](n)
    // BFS failure links; merge suffix outputs as we go
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      children(s).foreach { case (c, child) =>
        var f = fail(s)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(child) = if (children(f).contains(c) && children(f)(c) != child)
          children(f)(c) else 0
        ends(child) ++= ends(fail(child))
        queue.enqueue(child)
      }
    }
    new Automaton(
      children.map(_.keys.toArray).toArray,
      children.map(_.values.toArray).toArray,
      fail,
      ends.map(_.distinct.sorted.toArray).toArray)
  }
}

/** `multi_contains(text)`: the patterns (from the constructor) found in
  * `text`, in pattern-declaration order, deduplicated — one Aho–Corasick
  * scan per row. NULL text → NULL.
  */
case class MultiContains(child: Expression, patterns: Seq[String])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val automaton = AhoCorasick.compile(patterns)
  @transient private lazy val patternUtf8 =
    patterns.map(p => UTF8String.fromString(p)).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"multi_contains expects a string input, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "multi_contains"

  def matchedArray(text: UTF8String): GenericArrayData = {
    val idx = automaton.matches(text.toString)
    val out = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) { out(i) = patternUtf8(idx(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = matchedArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("multiContains", this,
      classOf[MultiContains].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $self.matchedArray($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContains =
    copy(child = newChild)
}

object MultiContains {
  def apply(text: Column, patterns: Seq[String]): Column =
    GraftShims.column(MultiContains(GraftShims.expression(text), patterns))
}

/** `bloom_might_contain(hash)`: membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]], inside codegen — replaces
  * the boxed Scala-UDF probe (Spark's own `might_contain` expression is
  * not on the public registry). The sketch rides as a reference object in
  * the task broadcast, the same shipping path an explicit
  * `sparkContext.broadcast` uses.
  */
case class BloomMightContain(child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | NullType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a long hash input, got ${dt.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(h: Any): Any = bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.mightContainLong($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(hash: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftShims.column(BloomMightContain(GraftShims.expression(hash), bloom))
}
