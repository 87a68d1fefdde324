package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column, with scan-local projection.
  *
  * Fit is one distributed covariance pass (Spark ML's PCA on a RowMatrix:
  * d×d Gramian per partition, merged treewise — executor state is O(d²),
  * never O(n)); the eigendecomposition of the tiny d×d matrix happens on
  * the driver. Projection is pure expression work: subtract the captured
  * mean, dot against each captured component — k literal-vector dots per
  * row inside codegen, no shuffle, usable at any corpus size (and over
  * streams).
  *
  * Unlike `ml.feature.PCA.transform` (which projects RAW vectors), the
  * projection here centers first — `(v − mean) · W` — so component scores
  * are the textbook centered PCA coordinates; the mean is captured in the
  * model precisely so downstream engines can reproduce the projection
  * bit-for-bit.
  *
  * Use cases this feeds: embedding whitening before cosine ANN, dimension
  * reduction ahead of [[Ann.ivfPqBuild]] (PQ on the top-k′ components), and
  * low-dim visual/diagnostic projections of a corpus.
  */
object Pca {

  /** A fitted PCA basis: per-dim mean and `k` principal axes (each length
    * dim, unit-norm, eigenvalue-descending). */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]]) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  /** Fit the top-`k` principal components of `vecCol` over the FULL frame —
    * the covariance aggregate is O(d²) per partition regardless of row
    * count, so unlike codebook training there is nothing to sample. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    import org.apache.spark.ml.feature.{PCA => MlPca}
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.stat.Summarizer
    require(k >= 1, "k must be >= 1")
    val feats = df.select(
      array_to_vector(transform(col(vecCol), x => x.cast("double"))).as("features"))
    val mean = feats.select(Summarizer.mean(col("features")).as("m"))
      .head().getAs[org.apache.spark.ml.linalg.Vector]("m").toArray
    require(k <= mean.length, s"k=$k exceeds vector dim ${mean.length}")
    val pc = new MlPca().setK(k).setInputCol("features").setOutputCol("pc")
      .fit(feats).pc // dim × k, column-major
    val components = Array.tabulate(k)(j => Array.tabulate(mean.length)(i => pc(i, j)))
    PcaModel(mean, components)
  }

  /** `vec − mean`: materialize this ONCE (a `withColumn`) before
    * [[projectCentered]] — the zip_with lambda is interpreted, so folding
    * it into each of the k dots would recompute the centering k times. */
  def center(vec: Column, model: PcaModel): Column = {
    val meanArr = array(model.mean.toIndexedSeq.map(lit): _*)
    zip_with(transform(vec, x => x.cast("double")), meanArr, (a, b) => a - b)
  }

  /** Projection of an already-centered vector onto the basis, as an
    * array<double> of length `model.k` — k codegen'd dots against literal
    * axes. */
  def projectCentered(centered: Column, model: PcaModel): Column =
    array(model.components.toIndexedSeq.map { w =>
      Ann.dot(centered, array(w.toIndexedSeq.map(lit): _*))
    }: _*)

  /** One-shot centered projection `(vec − mean) · W`. Convenience form —
    * prefer `center` + `projectCentered` through a materialized column when
    * projecting wide frames. */
  def project(vec: Column, model: PcaModel): Column =
    projectCentered(center(vec, model), model)
}
