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
  * O(partitions × capacity), independent of corpus size. Guarantees are the
  * standard ones: every true count c is within [reported − err, reported],
  * any item with true count > N/capacity is retained, and when the distinct
  * count never exceeds `capacity` (per partial) no eviction happens so
  * counts are EXACT with err = 0 — the correctness-gate configuration
  * (q84's oracle compares against exact counts).
  */
object HeavyHitters {

  /** One summary entry: `count` is an upper bound on the item's true
    * frequency, overcounted by at most `err` (0 ⇒ exact).
    */
  final case class Hit(term: String, count: Long, err: Long)

  /** Summary buffer: term → (count, err). Mutated in place per partial. */
  type Buf = mutable.HashMap[String, (Long, Long)]

  final class SpaceSavingTopK(capacity: Int)
      extends Aggregator[String, Buf, Seq[Hit]] {
    require(capacity >= 1, "capacity must be >= 1")

    override def zero: Buf = mutable.HashMap.empty

    // deterministic victim choice on count ties (smallest count, then
    // smallest term) keeps results stable for a fixed partition layout;
    // exactness never depends on it
    private def victim(b: Buf): (String, (Long, Long)) =
      b.minBy { case (t, (c, _)) => (c, t) }

    override def reduce(b: Buf, term: String): Buf = {
      if (term == null) return b
      b.get(term) match {
        case Some((c, e)) => b.update(term, (c + 1, e))
        case None if b.size < capacity => b.update(term, (1L, 0L))
        case None =>
          // SpaceSaving eviction: the new item inherits the victim's count
          // as its overcount bound
          val (vt, (vc, _)) = victim(b)
          b.remove(vt)
          b.update(term, (vc + 1, vc))
      }
      b
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      // pointwise sum of counts and error bounds (mergeable-summaries
      // merge), then trim back to capacity keeping the largest counts
      b2.foreach { case (t, (c2, e2)) =>
        b1.get(t) match {
          case Some((c1, e1)) => b1.update(t, (c1 + c2, e1 + e2))
          case None => b1.update(t, (c2, e2))
        }
      }
      if (b1.size <= capacity) b1
      else {
        val kept = b1.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(capacity)
        val nb: Buf = mutable.HashMap.empty
        kept.foreach { case (t, ce) => nb.update(t, ce) }
        nb
      }
    }

    /** Full summary, deterministically ordered (count desc, term asc);
      * callers explode and window for per-group top-k.
      */
    override def finish(b: Buf): Seq[Hit] =
      b.toSeq.sortBy { case (t, (c, _)) => (-c, t) }
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
