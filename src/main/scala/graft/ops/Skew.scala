package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins with hot keys.
  *
  * AQE's skew-join splitting (enabled in [[graft.Sessions]]) handles most
  * skew at runtime; explicit salting is the plan-level tool for the
  * pathological case — one key carrying a double-digit percentage of a
  * fact table joined against a dimension too big to broadcast.
  *
  * [[saltedJoin]] salts ONLY detected hot keys: hot fact rows split across
  * `salts` sub-keys (salt derived deterministically from a second column's
  * hash, so retries are stable) with the matching dim rows replicated
  * `salts` times, while the cold majority takes a plain un-replicated
  * equi-join; the two halves union. The salt layer is result-invisible —
  * only the physical shape changes. At 100 TB this matters: all-keys
  * salting (still available as [[HotKeySpec.All]]) pays a `salts`×
  * dimension shuffle for every key when typically only a handful are hot.
  */
object Skew {

  /** Inner equi-join of `fact` (potentially skewed on `key`) with `dim`
    * (small-ish but not broadcastable). `spreadCol` is any fact column
    * with per-row variety (an id, a timestamp) used to derive the
    * deterministic salt. `hotKeys` picks which keys pay the salt+replicate
    * cost — default: sampled detection ([[HotKeySpec.Sampled]]).
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      spreadCol: String, salts: Int,
      hotKeys: HotKeySpec = HotKeySpec.Sampled()): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    HotKeys.resolve(fact, key, hotKeys) match {
      case None => saltAll(fact, dim, key, spreadCol, salts)
      case Some(hot) if hot.isEmpty => fact.join(dim, Seq(key))
      case Some(hot) =>
        val (cold, salted) = saltedJoinParts(fact, dim, key, spreadCol, salts, hot)
        cold.unionByName(salted)
    }
  }

  /** The two halves of the hot-key-routed join, separable for plan tests:
    * cold keys join un-replicated; hot keys take the salted path. The
    * `isInCollection` routing predicate is a codegen'd IN over a bounded
    * key list (≤ the detector's `maxKeys`) — no extra join or shuffle to
    * route. */
  private[graft] def saltedJoinParts(
      fact: DataFrame, dim: DataFrame, key: String,
      spreadCol: String, salts: Int, hot: Seq[Any]): (DataFrame, DataFrame) = {
    val isHot = col(key).isInCollection(hot)
    val cold = fact.filter(!isHot || col(key).isNull)
      .join(dim.filter(!isHot || col(key).isNull), Seq(key))
    val salted = saltAll(fact.filter(isHot), dim.filter(isHot), key, spreadCol, salts)
    (cold, salted)
  }

  /** Legacy all-keys salting: every fact row salted, the WHOLE dim
    * replicated `salts` times. */
  private def saltAll(
      fact: DataFrame, dim: DataFrame, key: String,
      spreadCol: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(spreadCol)), lit(salts)).cast("int"))
    val saltedDim = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
