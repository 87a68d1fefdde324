package graft.ops

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the distributed shape of the
  * fastText-style quality classifier most LLM data pipelines run after the
  * heuristic filters (e.g. GPT-3's LR classifier over web pages, Brown et
  * al. 2020 App. A; CCNet's fastText LID+quality stages): train a linear
  * model on hashed bag-of-words features against a weak label, then score
  * every document and keep/bucket by probability.
  *
  * Scale design: feature hashing is per-row expression work (md5-derived
  * bucket per token — engine-portable, no vocabulary state), so SCORING is
  * a pure scan: the trained coefficient vector rides in the plan as a
  * literal array and the score is one native dot product + sigmoid per
  * row; no shuffle, no model broadcast beyond plan literals. TRAINING
  * aggregates the corpus once into (features, label) rows and runs Spark
  * ML's LBFGS logistic regression — the model that comes back is
  * `nFeatures + 1` doubles on the driver, the aggregate-to-driver scalar
  * contract (same as BM25 stats / k-means centroids).
  */
object Quality {

  /** md5-derived feature bucket of a token: the first 8 hex digits as an
    * integer, mod `nFeatures` — deterministic and identically computable
    * in any engine with md5 (DuckDB: the q93 strpos-fold or a hex cast).
    */
  def featureBucket(token: Column, nFeatures: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % nFeatures

  /** Hashed bag-of-words feature vector of a text column: an
    * `array<double>` of length `nFeatures` with per-bucket token counts.
    * Native one-pass expression — each token is digested once
    * ([[graft.functions.HashedBowUtil]]); bucket contract is exactly
    * [[featureBucket]], which the oracle re-derives in SQL.
    */
  def hashedFeatures(textCol: Column, nFeatures: Int): Column = {
    require(nFeatures >= 2 && nFeatures <= 1024, "nFeatures out of range")
    graft.functions.HashedBow(Text.words(textCol), nFeatures)
  }

  final case class LinearModel(coefficients: Array[Double], intercept: Double)

  /** Train a logistic-regression quality model: `labelCol` must be 0/1
    * (the weak label — e.g. "looks like the target language/domain").
    * Returns the coefficient vector + intercept; feed to [[score]].
    */
  def train(
      docs: DataFrame, textCol: String, labelCol: String,
      nFeatures: Int = 64, maxIter: Int = 25, regParam: Double = 0.0): LinearModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val data = docs.select(
      array_to_vector(hashedFeatures(col(textCol), nFeatures)).as("features"),
      col(labelCol).cast("double").as("label"))
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(true)
    val m = lr.fit(data)
    LinearModel(m.coefficients.toArray, m.intercept)
  }

  /** Score documents under a trained model: p = sigmoid(w·x + b), emitted
    * with the feature count so downstream thresholds can bucket. Pure
    * per-row scan work — coefficients are plan literals, the dot product
    * is the native codegen'd expression.
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      model: LinearModel): DataFrame = {
    val feats = hashedFeatures(col(textCol), model.coefficients.length)
    val coefs = array(model.coefficients.toIndexedSeq.map(lit): _*)
    val z = graft.functions.DotProduct(feats, coefs) + lit(model.intercept)
    docs.select(col(idCol),
      (lit(1.0) / (lit(1.0) + exp(-z))).as("quality_prob"))
  }
}
