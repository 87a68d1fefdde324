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
  * [[saltedJoin]] splits each hot fact key across `salts` sub-keys (salt
  * derived deterministically from a second column's hash, so retries are
  * stable) and replicates the dimension row `salts` times — turning one
  * executor-crushing partition into `salts` even ones at the cost of
  * |dim|·salts extra rows.
  */
object Skew {

  /** Inner equi-join of `fact` (potentially skewed on `key`) with `dim`
    * (small-ish but not broadcastable), salted `salts` ways.
    * `spreadCol` is any fact column with per-row variety (an id, a
    * timestamp) used to derive the deterministic salt.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      spreadCol: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(spreadCol)), lit(salts)).cast("int"))
    val saltedDim = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
