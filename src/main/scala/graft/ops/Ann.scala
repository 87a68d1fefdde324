package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, same output contract:
  *   - [[bruteTopK]] — exact cosine top-k: broadcast the (small) query set,
  *     one scan of the corpus, per-query top-k via aggregate, no shuffle of
  *     the corpus itself. The correct baseline and the right answer whenever
  *     the query set fits in a broadcast.
  *   - [[lshTopK]] — random-hyperplane LSH: corpus is bucketed by an m-bit
  *     signature; queries probe only buckets within `probeDistance` bits of
  *     their own signature, candidates are re-ranked exactly. The scale path:
  *     scan cost drops to the probed buckets' share of the corpus
  *     (~C(m,≤d)/2^m), the standard IVF/LSH trade of recall for scan
  *     fraction.
  *
  * All vector math is expression-level (`zip_with` + `aggregate`), inside
  * codegen, executor-side only.
  */
object Ann {

  /** Cosine similarity of two float-array columns (expression, no UDF). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)
    def norm(x: Column): Column = sqrt(dot(x, x))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** Exact top-k neighbours per query vector.
    *
    * `queries` must be broadcast-small (the common "embed the prompt, search
    * the corpus" shape). Plan: broadcast-nested-loop join (query set × corpus
    * scan) → per-query window top-k. One pass over the corpus, no corpus
    * shuffle beyond the top-k aggregation.
    */
  def bruteTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("cv"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes: `m` unit-free direction vectors of
    * dimension `dim`, from a seeded PRNG, as a literal column (tiny: m×dim
    * doubles shipped with the plan).
    */
  private def hyperplanes(m: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(m)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern signature of a vector against the hyperplanes (m bits in a
    * long, m ≤ 63).
    */
  private def signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      val dot = aggregate(zip_with(vec, plane, (v, h) => v * h), lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Embedding-cosine near-duplicate pairs: multi-probe LSH buckets generate
    * candidates (one shuffle join on the bucket key, never all-pairs), exact
    * cosine filters them — zero false positives, recall set by (m,
    * probeDistance). The embedding-space sibling of Dedup.minhashLshPairs.
    */
  def cosinePairs(
      corpus: DataFrame, id: String, vec: String,
      threshold: Double, m: Int = 14, dim: Int, probeDistance: Int = 1,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(m, dim, seed)
    // persisted: both self-join sides read this frame and differ only by
    // alias, so without it the m-hyperplane signature pass runs twice
    val sigd = corpus.select(col(id).as("vid"), col(vec).as("v"),
      signature(col(vec), planes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val masks = probeMasks(m, probeDistance)
    val a = sigd
      .withColumn("bucket", explode(array(masks.map(mk => col("sig").bitwiseXOR(lit(mk))): _*)))
      .select(col("bucket"), col("vid").as("id_a"), col("v").as("va"))
    val b = sigd.select(col("sig").as("bucket"), col("vid").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** All bit-masks within `d` flips of zero (multi-probe enumeration). */
  private def probeMasks(m: Int, d: Int): Seq[Long] = {
    def combos(bits: Seq[Int], k: Int): Seq[Seq[Int]] =
      if (k == 0) Seq(Nil)
      else combos(bits, k - 1) ++ bits.combinations(k).toSeq
    combos(0 until m, d).distinct.map(_.foldLeft(0L)((acc, b) => acc | (1L << b)))
  }

  /** IVF-style approximate top-k: k-means centroids partition the corpus
    * into `nlist` cells; each query probes its `nprobe` nearest cells and
    * re-ranks candidates exactly.
    *
    * The index-build (one MLlib k-means fit, seeded/deterministic) is an
    * offline step amortized over all queries — at 100 TB you train on a
    * sample, persist centroid assignments as a column, and every search
    * scans ~nprobe/nlist of the corpus. Search-time plan: broadcast the
    * probed (query, cell) pairs, shuffle-free filter join on the cell id,
    * window top-k.
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 2, seed: Long = 42L,
      maxTrainVectors: Int = 65536): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // Train centroids on a bounded deterministic sample, never the full
    // corpus: cell quality converges with a few thousand vectors per cell,
    // and at 100 TB a full-corpus k-means would dwarf the search itself.
    val train = corpus
      .select(col(corpusId).as("tid"), array_to_vector(col(corpusVec)).as("features"))
      .orderBy(xxhash64(col("tid"), lit(seed))).limit(maxTrainVectors)
      .select("features")
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(train)
    val centroids = model.clusterCenters.map(_.toArray)

    // nearest-cell assignment as a pure expression over the (small) centroid
    // literals: argmin over squared L2 — no UDF, stays in codegen
    def cellOf(vec: Column): Column = {
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        val cArr = array(c.toIndexedSeq.map(lit): _*)
        val d2 = aggregate(zip_with(vec, cArr, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v)
        struct(d2.as("d2"), lit(i).as("cell"))
      }
      least(scored.toIndexedSeq: _*).getField("cell")
    }
    def cellsOf(vec: Column, n: Int): Column = {
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        val cArr = array(c.toIndexedSeq.map(lit): _*)
        val d2 = aggregate(zip_with(vec, cArr, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v)
        struct(d2.as("d2"), lit(i).as("cell"))
      }
      slice(array_sort(array(scored.toIndexedSeq: _*)), 1, n)
    }

    val bucketed = corpus.select(col(corpusId).as("item_id"), col(corpusVec).as("cv"),
      cellOf(col(corpusVec)).as("cell"))
    val probed = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
        explode(cellsOf(col(queryVec), nprobe)).as("probe"))
      .select(col("query_id"), col("qv"), col("probe").getField("cell").as("cell"))

    val candidates = bucketed.join(broadcast(probed), Seq("cell"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), round(col("cos"), 6).as("cos"))
  }

  /** Approximate top-k: LSH-bucketed candidate pruning + exact re-rank.
    *
    * Queries probe every bucket whose signature differs from theirs by at
    * most `probeDistance` bits (multi-probe: recall without re-hashing).
    */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, m: Int = 12, dim: Int, probeDistance: Int = 1, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(m <= 20, "signature width beyond 20 bits makes multi-probe enumeration explode")
    val planes = hyperplanes(m, dim, seed)

    val bucketed = corpus.select(
      col(corpusId).as("item_id"), col(corpusVec).as("cv"),
      signature(col(corpusVec), planes).as("bucket"))

    val masks = probeMasks(m, probeDistance)
    val probed = queries.select(
        col(queryId).as("query_id"), col(queryVec).as("qv"),
        signature(col(queryVec), planes).as("qsig"))
      .withColumn("bucket", explode(array(masks.map(mk => col("qsig").bitwiseXOR(lit(mk))): _*)))

    val candidates = bucketed.join(broadcast(probed), Seq("bucket"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("item_id"), round(col("cos"), 6).as("cos"))
  }
}
