package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Bounded-memory heavy hitters: the SpaceSaving summary (Metwally et al.
  * 2005, "Efficient computation of frequent and top-k elements in data
  * streams") as a Spark `Aggregator`, merged per Agarwal et al. 2012
  * ("Mergeable Summaries").
  *
  * The scale story: "top words over the corpus" as a plain
  * `groupBy(word).count.orderBy.limit` shuffles EVERY distinct term — at
  * 100 TB that is a full-vocabulary exchange dominated by the hapax tail.
  * The SpaceSaving aggregate instead keeps a capacity-bounded summary per
  * map task (ObjectHashAggregate partials), ships only `capacity` entries
  * per partition, and merges them associatively — shuffle volume is
  * O(partitions × capacity), independent of corpus size.
  *
  * Guarantees (maintained across merges via the `floor` bound — the
  * largest count ever evicted or trimmed away, which upper-bounds any
  * absent item's true count): every reported count satisfies
  * `reported − err ≤ true ≤ reported`; and when no summary in the tree
  * ever evicts or trims (distinct count ≤ capacity throughout) counts are
  * EXACT with err = 0 — the correctness-gate configuration (q84's oracle
  * compares against exact counts).
  */
object HeavyHitters {

  /** One summary entry: `count` is an upper bound on the item's true
    * frequency, overcounted by at most `err` (0 ⇒ exact).
    */
  final case class Hit(term: String, count: Long, err: Long)

  /** Mutable summary buffer.
    *
    * `floor` is the SpaceSaving absence bound: any term NOT in `map` has
    * true count ≤ floor in the stream this summary has absorbed (0 until
    * the first eviction/trim). Merges use it as the absent side's
    * count/err contribution, which is what keeps the per-entry guarantee
    * valid across arbitrary merge trees.
    *
    * `minCount`/`candidates` implement amortized O(1) eviction: candidates
    * holds the terms whose stored count equaled `minCount` at the last
    * rebuild, in term order (the same victim sequence the naive global
    * `minBy((count, term))` scan would produce — stored counts never drop
    * below minCount, so the cohort IS the global minimum until it drains).
    * Entries incremented past minCount are skipped lazily at pop time.
    */
  final class Buf(
      val map: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty,
      var floor: Long = 0L) extends Serializable {
    @transient private var minCount: Long = 0L
    @transient private var candidates: mutable.ArrayDeque[String] = null

    def invalidateEvictionState(): Unit = { candidates = null }

    /** Remove and return a minimal (count, term) entry. O(capacity) only
      * when the min-count cohort drains; O(1) otherwise.
      */
    def evictVictim(): (String, (Long, Long)) = {
      while (candidates == null || candidates.isEmpty) {
        minCount = map.valuesIterator.map(_._1).min
        candidates = mutable.ArrayDeque.from(
          map.iterator.collect { case (t, (c, _)) if c == minCount => t }.toSeq.sorted)
      }
      val t = candidates.removeHead()
      map.get(t) match {
        case Some((c, e)) if c == minCount => map.remove(t); (t, (c, e))
        case _ => evictVictim() // stale candidate (incremented since rebuild)
      }
    }
  }

  final class SpaceSavingTopK(capacity: Int)
      extends Aggregator[String, Buf, Seq[Hit]] {
    require(capacity >= 1, "capacity must be >= 1")

    override def zero: Buf = new Buf()

    override def reduce(b: Buf, term: String): Buf = {
      if (term == null) return b
      b.map.get(term) match {
        case Some((c, e)) => b.map.update(term, (c + 1, e))
        case None if b.map.size < capacity =>
          // absent ⇒ true count so far ≤ floor: admit at the bound
          b.map.update(term, (b.floor + 1, b.floor))
          b.invalidateEvictionState()
        case None =>
          // SpaceSaving eviction: the new item inherits the victim's count
          // as its overcount bound
          val (_, (vc, _)) = b.evictVictim()
          b.floor = math.max(b.floor, vc)
          b.map.update(term, (vc + 1, vc))
      }
      b
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      // mergeable-summaries merge: pointwise sum, an absent side
      // contributing its floor as both count and error bound
      b2.map.foreach { case (t, (c2, e2)) =>
        b1.map.get(t) match {
          case Some((c1, e1)) => b1.map.update(t, (c1 + c2, e1 + e2))
          case None => b1.map.update(t, (b1.floor + c2, b1.floor + e2))
        }
      }
      if (b2.floor > 0)
        b1.map.keysIterator.filterNot(b2.map.contains).toSeq.foreach { t =>
          val (c1, e1) = b1.map(t)
          b1.map.update(t, (c1 + b2.floor, e1 + b2.floor))
        }
      // Error bounds ADD under merging (Agarwal et al. §3): a term absent
      // from both sides can have true count up to floor1 + floor2, so the
      // combined absence bound is the sum, not the max. (The per-entry
      // absent-side contributions above each used their own side's
      // pre-merge floor, which stays consistent with this.)
      b1.floor = b1.floor + b2.floor
      if (b1.map.size > capacity) {
        // trim back to capacity keeping the largest counts; anything
        // dropped raises the absence floor so a reappearance in a later
        // merge is bounded, not silently undercounted
        val all = b1.map.toSeq.sortBy { case (t, (c, _)) => (-c, t) }
        all.drop(capacity).foreach { case (t, (c, _)) =>
          b1.floor = math.max(b1.floor, c)
          b1.map.remove(t)
        }
      }
      b1.invalidateEvictionState()
      b1
    }

    /** Full summary, deterministically ordered (count desc, term asc);
      * callers explode and window for per-group top-k.
      */
    override def finish(b: Buf): Seq[Hit] =
      b.map.toSeq.sortBy { case (t, (c, _)) => (-c, t) }
        .map { case (t, (c, e)) => Hit(t, c, e) }

    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  }

  /** Column-API entry: `HeavyHitters.topK(4096)(col("word"))`. */
  def topK(capacity: Int): Column => Column = {
    val u = org.apache.spark.sql.functions.udaf(
      new SpaceSavingTopK(capacity), Encoders.STRING)
    c => u(c)
  }

  /** Register as the SQL aggregate `approx_top_terms(term)` — capacity is
    * fixed at registration (SQL UDAFs can't take scalar config args).
    */
  def register(spark: SparkSession, capacity: Int = 4096): Unit =
    spark.udf.register("approx_top_terms",
      org.apache.spark.sql.functions.udaf(new SpaceSavingTopK(capacity), Encoders.STRING))

  private val registeredSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Idempotent per-session registration (the Runner calls this). */
  def registerOnce(spark: SparkSession): Unit =
    if (registeredSessions.add(spark)) register(spark)
}
