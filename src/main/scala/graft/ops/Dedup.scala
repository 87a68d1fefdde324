package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed deduplication operators for document corpora.
  *
  * Scale design (the part that matters at 100 TB):
  *   - Nothing here ever does an all-pairs comparison. Candidate pairs come
  *     from inverted-index joins (shared shingle), LSH band buckets
  *     (MinHash), or bit-chunk buckets (SimHash) — each a plain shuffle
  *     join on a bounded key, so cost scales with the number of genuinely
  *     similar pairs, not n².
  *   - Hot keys are the failure mode of inverted indexes ("the cat" appears
  *     in every document). `maxShingleDocFreq` drops shingles shared by more
  *     than N docs — a standard stop-shingle cut that bounds any single
  *     join key's fan-out (N² pairs max per shingle).
  *   - Everything is expression-level (no UDFs) so Catalyst/AQE handle
  *     pushdown, codegen, and skew.
  *   - Pair-mining operators persist their compact signature frame (both
  *     self-join sides read it; alias-differing subtrees defeat exchange
  *     reuse). The cached blocks follow Spark's normal lifecycle;
  *     long-running services should `spark.catalog.clearCache()` between
  *     large corpora runs.
  */
/** Stop-shingle cap specification for the inverted-index pair miners.
  *
  * A dedicated ADT rather than an `Option[Int]` with a magic value: every
  * cap state is spelled out, `Fixed(0)` is unrepresentable instead of
  * silently meaning "auto", and call sites read as policy
  * (`CapSpec.Auto` / `CapSpec.Fixed(50)` / `CapSpec.Off`).
  */
sealed trait CapSpec
object CapSpec {
  /** Derive the cap from the corpus size as `max(1000, ndocs/1000)` — large
    * enough never to touch a real near-dup signal, small enough that one
    * corpus-wide shingle cannot fan a single join key out quadratically.
    * Costs one count job; skipped when doc frequency provably can't exceed
    * the derived cap. The default since round 3 — see SCALE.md for the
    * behavioral note vs the round-2 uncapped default.
    */
  case object Auto extends CapSpec
  /** Drop shingles shared by more than `maxDocFreq` documents. */
  final case class Fixed(maxDocFreq: Long) extends CapSpec {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
  }
  /** No stop-shingle cut (round-2 behavior; unsafe on hot-key corpora). */
  case object Off extends CapSpec
}

object Dedup {

  /** Ensure enough partitions to parallelize expression-heavy per-row work.
    * Single-file/single-row-group local inputs scan as ONE partition, which
    * serializes shingling onto one core; on a real multi-file table this is
    * a no-op (the scan already has ≥ cluster parallelism).
    *
    * Decides from the optimized plan's size statistics (bytes ÷
    * `files.maxPartitionBytes` ≈ scan parallelism) — never `df.rdd`, which
    * would force physical planning and RDD conversion on every miner call
    * even for well-partitioned tables. Inputs whose estimated parallelism
    * already covers the cluster (or is unknown: stats default to huge)
    * pass through untouched.
    */
  private[ops] def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxBytes =
      math.max(1L, org.apache.spark.sql.GraftShims.filesMaxPartitionBytes(spark))
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estParts =
      if (sizeBytes > BigInt(Long.MaxValue)) Long.MaxValue
      else math.max(1L, (sizeBytes.toLong + maxBytes - 1) / maxBytes)
    if (estParts < target) df.repartition(target) else df
  }

  /** Resolve the stop-shingle cap: [[CapSpec.Auto]] derives it from the
    * corpus size (one cheap count job — unavoidable, the cap IS a function
    * of ndocs) and skips the cut entirely when doc frequency provably cannot
    * exceed it; explicit caps apply lazily with no eager job.
    */
  private def resolveCap(spec: CapSpec, docs: DataFrame, idCol: String): Option[Long] =
    spec match {
      case CapSpec.Auto =>
        val ndocs = docs.select(idCol).count()
        val c = math.max(1000L, ndocs / 1000L)
        if (ndocs <= c) None else Some(c) // df ≤ ndocs ≤ cap ⇒ provably empty cut
      case CapSpec.Fixed(c) => Some(c)
      case CapSpec.Off => None
    }

  /** Per-document shingle profiles from a hashed posting list
    * `(groupCols..., h)`: the ascending-h-sorted hash array `hs` (for exact
    * merge-intersect verification), its size `n_shingles`, and the
    * PPJoin-style frequency-ordered `prefix` (for candidate generation).
    *
    * Prefix filtering (Bayardo et al., "Scaling Up All Pairs Similarity
    * Search", WWW'07; Xiao et al., "Efficient Similarity Joins for Near
    * Duplicate Detection", WWW'08): under any global total order on
    * shingles, two sets with jaccard ≥ t must share an element within their
    * `n - ⌈t·n⌉ + 1` prefixes — if the globally-smallest common element sat
    * outside A's prefix, all common elements would fit in A's ⌈t·n⌉ − 1
    * suffix, contradicting |A∩B| ≥ ⌈t·|A|⌉. Ordering ascending by document
    * frequency puts every hot shingle in the (unindexed) suffixes, so the
    * candidate join's per-key fan-out collapses to the rare-shingle buckets
    * — the quadratic hot-key blowup of a full inverted-index self-join
    * never materializes, at any corpus size.
    *
    * The prefix keeps each element's 1-based position in the frequency
    * order (`struct(h, pos)`), feeding PPJoin's positional filter at the
    * candidate join (see [[minePairs]]).
    *
    * The optional `cap` (stop-shingle cut) drops shingles with doc
    * frequency above it BEFORE sizing, so downstream jaccard is the exact
    * jaccard of the capped shingle space; with frequency data already
    * joined for the ordering, the cut is a plain `df <= cap` filter.
    */
  private def buildProfiles(posting: DataFrame, groupCols: Seq[String],
      threshold: Double, cap: Option[Long]): DataFrame = {
    // ONE posting pass (r19; guide §2.4): document frequency as a
    // whole-partition window aggregate over the same keying the old
    // groupBy(h) + join-back needed. The join re-ran the scan + shingle
    // hash pass behind a SECOND corpus exchange — the aggregate's
    // partial/column-pruned subtree never canonicalizes equal to the
    // probe's, so exchange reuse cannot fire (same fix as Spans.dupSpans).
    // Every posting row crossed an h-exchange before (as the join probe);
    // a capped-out hot shingle's group sits in WindowExec's spillable
    // buffer — the same rows the merge join streamed through one partition.
    val withDf = posting.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
    val kept = cap match {
      case Some(c) => withDf.filter(col("df") <= c)
      case None => withDf
    }
    kept
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sorted"))
      .withColumn("n_shingles", size(col("sorted")))
      // ⌈t·n⌉ with an epsilon guard: double rounding up (0.3·10 = 3.0000…04)
      // would shorten the prefix below the lemma's bound and admit false
      // negatives; the epsilon can only lengthen the prefix (always safe)
      .withColumn("prefix",
        transform(
          slice(col("sorted"), lit(1),
            (col("n_shingles") - ceil(lit(threshold) * col("n_shingles") - lit(1e-9)) + 1).cast("int")),
          (s, i) => struct(s.getField("h").as("h"), (i + 1).as("pos"))))
      .select(groupCols.map(col) ++ Seq(
        sort_array(transform(col("sorted"), s => s.getField("h"))).as("hs"),
        col("n_shingles"), col("prefix")): _*)
  }

  /** PPJoin length + positional filters for one shared prefix element at
    * 1-based frequency-order positions `pa`/`pb` of docs sized `na`/`nb`
    * (Xiao et al., WWW'08 §3): jaccard ≥ t requires overlap
    * `common ≥ t/(1+t)·(na+nb)` (= α); the match at (pa, pb) bounds it by
    * `1 + min(na−pa, nb−pb)`, and the sizes alone require
    * `min(na,nb) ≥ t·max(na,nb)`. Epsilon slack only loosens the bounds
    * (never drops a true pair). Applied INSIDE the candidate join, so
    * non-viable matches die before the dedup shuffle.
    */
  private def ppjoinFilter(threshold: Double): Column = {
    val alpha = lit(threshold / (1.0 + threshold)) * (col("na") + col("nb")) - lit(1e-9)
    (least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")) - lit(1e-9)) &&
      ((lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))).cast("double") >= alpha)
  }

  /** Exact duplicate groups by key columns (hash-shuffle groupBy). */
  def exactGroups(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= 2)

  /** Exact content dedup via md5(text): keep the lowest id per digest. */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Incremental exact dedup: rows of `incoming` whose content digest does
    * not already exist in `corpus` — the ingest-time filter (drop what the
    * lake already holds) as one anti-join on the digest. At 100 TB the
    * corpus side reduces to its distinct digests before the join (a 16-byte
    * column, typically pre-computed/stored); nothing ever pairs row-to-row.
    */
  def exactNewOnly(incoming: DataFrame, corpus: DataFrame, textCol: String): DataFrame = {
    val corpusDigests = corpus.select(md5(col(textCol)).as("_digest")).distinct()
    incoming.withColumn("_digest", md5(col(textCol)))
      .join(corpusDigests, Seq("_digest"), "left_anti")
      .drop("_digest")
  }

  /** [[exactNewOnly]] with a Bloom-filter pre-pass: same output (rows of
    * `incoming` whose content is absent from `corpus`), but rows the filter
    * proves new skip the anti-join entirely.
    *
    * Why this matters at 100 TB: in steady-state ingest almost everything
    * incoming IS new, so the plain anti-join shuffles the whole incoming
    * corpus to prove a negative. The Bloom filter — a fixed-size sketch
    * built with one aggregate over the corpus digests (~1.2 GB at 1e9 items
    * / 1% fpp; scale `expectedItems` to the corpus) and broadcast once —
    * answers "definitely new" locally at the scan, so only the ~fpp false
    * positives plus the true duplicates reach the exchange. The anti-join
    * confirm on md5 keeps the result exact: a Bloom "maybe" is never
    * trusted, so output equals [[exactNewOnly]] row-for-row.
    *
    * The membership probe is the native codegen'd
    * [[graft.functions.BloomMightContain]] expression (the sketch ships as
    * a task-broadcast reference object); it gates only which join path a
    * row takes, never the result, and costs a few hash probes per row.
    */
  def exactNewOnlyBloom(
      incoming: DataFrame, corpus: DataFrame, textCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = corpus.select(xxhash64(col(textCol)).as("_h"))
      .stat.bloomFilter("_h", expectedItems, fpp)
    val probed = incoming.withColumn("_maybe",
      graft.functions.BloomMightContain(xxhash64(col(textCol)), bf))
    val definitelyNew = probed.filter(!col("_maybe")).drop("_maybe")
    val confirmed = exactNewOnly(probed.filter(col("_maybe")).drop("_maybe"),
      corpus, textCol)
    definitelyNew.unionAll(confirmed)
  }

  /** Near-dup pairs BETWEEN two corpora (fresh crawl vs existing lake):
    * the inverted-index join of [[ngramJaccardPairs]], but across sides —
    * each emitted pair is (incoming id, corpus id, exact jaccard ≥
    * threshold). The stop-shingle cap is derived from (and applied to)
    * both sides' combined posting lists.
    */
  /** @param persistProfiles cache the per-doc profile frame for the
    *   4 plan subtrees that read it (default). Pass `false` from
    *   long-running callers that cannot clear the session cache (e.g. a
    *   per-micro-batch streaming filter): profiles are recomputed per
    *   consumer instead of accumulating persisted frames across calls.
    */
  def ngramJaccardAgainst(
      incoming: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocFreq: CapSpec = CapSpec.Auto,
      persistProfiles: Boolean = true): DataFrame = {
    // One tagged posting list: document frequency (the prefix order AND the
    // cap) is computed over the COMBINED corpus, giving both sides the same
    // global shingle order — required by the prefix-filter lemma. Sides are
    // tagged BEFORE the spread so the union shingles through a single
    // repartition + codegen pipeline (two per-side spreads would shuffle
    // the full text twice and duplicate the shingling stage).
    def tag(df: DataFrame, side: Int): DataFrame =
      df.select(lit(side).as("side"), col(idCol).as("doc_id"), col(textCol).as("_text"))
    val tagged = tag(incoming, 0).unionAll(tag(corpus, 1))
    val capSpec = maxShingleDocFreq match {
      case CapSpec.Auto =>
        val ndocs = tagged.count() // one job over the pre-spread union
        val c = math.max(1000L, ndocs / 1000L)
        if (ndocs <= c) None else Some(c)
      case CapSpec.Fixed(c) => Some(c)
      case CapSpec.Off => None
    }
    // explode_outer + null filter: a plain explode triggers
    // InferFiltersFromGenerate, whose size() pre-filter is pushed below the
    // projection and re-derives the whole shingle pass in a scan Filter
    // (2× the dominant cost; see bpePairCounts for the measured case)
    // fused shingle→hash expression (r18): the miner only consumes
    // xxhash64(shingle), so the strings never materialize — the emitted
    // longs are bit-identical to xxhash64 over the shingle strings
    val posting = spread(tagged)
      .select(col("side"), col("doc_id"),
        explode_outer(graft.functions.WordShingleHashes64(col("_text"), n)).as("h"))
      .filter(col("h").isNotNull)
    val prof0 = buildProfiles(posting, Seq("side", "doc_id"), threshold, capSpec)
    val prof = if (persistProfiles) prof0.persist(StorageLevel.MEMORY_AND_DISK) else prof0
    def pre(s: Int, idName: String, nName: String, pName: String): DataFrame =
      prof.filter(col("side") === s)
        .select(col("doc_id").as(idName), col("n_shingles").as(nName),
          explode(col("prefix")).as("pe"))
        .select(col(idName), col(nName), col("pe.h").as("h"), col("pe.pos").as(pName))
    val preIn = pre(0, "id_in", "na", "pa")
    val preCo = pre(1, "id_corpus", "nb", "pb")
    val cand = preIn.join(preCo, preIn("h") === preCo("h") && ppjoinFilter(threshold))
      .select("id_in", "id_corpus")
      .dropDuplicates("id_in", "id_corpus")
    cand
      .join(prof.filter(col("side") === 0).select(col("doc_id").as("id_in"),
        col("hs").as("hs_a"), col("n_shingles").as("na")), Seq("id_in"))
      .join(prof.filter(col("side") === 1).select(col("doc_id").as("id_corpus"),
        col("hs").as("hs_b"), col("n_shingles").as("nb")), Seq("id_corpus"))
      .withColumn("common", graft.functions.SortedIntersectCount(col("hs_a"), col("hs_b")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_in"), col("id_corpus"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact n-gram Jaccard similarity for all pairs at or above `threshold`.
    *
    * Prefix-filtered similarity join (see [[buildProfiles]]): candidates
    * come from an equi-join on the docs' frequency-ordered shingle
    * prefixes — complete for pairs with jaccard ≥ threshold — and are then
    * verified exactly: |A∩B| via array intersection of the full shingle-hash
    * sets, |A∪B| = |A|+|B|-|A∩B|. Output: (id_a, id_b, jaccard) with
    * jaccard ≥ `threshold`; `withCounts` adds the exact (common, union_size)
    * integers.
    *
    * The stop-shingle cap is ON by default ([[CapSpec.Auto]]): shingles shared by
    * more than the cap's doc count are dropped from the index before the
    * self-join, and doc sizes are re-computed over the surviving universe —
    * so the emitted jaccard is the EXACT jaccard of the capped shingle
    * space. Pairs whose overlap is exclusively stop-shingles are lost — the
    * standard trade; at 100 TB an uncapped hot shingle is an N² join key.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocFreq: CapSpec = CapSpec.Auto,
      withCounts: Boolean = false): DataFrame = {
    // Native WordShingles expression: codegen'd single-pass shingling. (The
    // composed functions._ form is interpreted per-lambda-element AND gets
    // cloned into scan filters by InferFiltersFromGenerate + pushdown;
    // measured 3-4× slower.) No `size > 0` row filter: explode() drops
    // empty arrays for free.
    val shingled = spread(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.WordShingleHashes64(col(textCol), n).as("shingles"))
    minePairs(shingled, docs, idCol, threshold, maxShingleDocFreq, withCounts)
  }

  /** Character n-gram Jaccard near-dup pairs — the word-free sibling of
    * [[ngramJaccardPairs]] for text without useful whitespace tokenization
    * (CJK, code, URLs): distinct char n-grams of the lowercased text feed
    * the same inverted-index machinery, caps included. Documents shorter
    * than `n` characters have no shingles and never pair.
    */
  def charJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      threshold: Double = 0.8,
      stride: Int = 1,
      maxShingleDocFreq: CapSpec = CapSpec.Auto,
      withCounts: Boolean = false): DataFrame = {
    // native codegen'd expression; lowercasing mirrors Text.charShingles
    val shingled = spread(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.CharShingleHashes64(lower(col(textCol)), n, stride).as("shingles"))
    minePairs(shingled, docs, idCol, threshold, maxShingleDocFreq, withCounts)
  }

  /** Shared prefix-filtered pair miner over a (doc_id, shingles) frame.
    *
    * Postings carry xxhash64(shingle), not the shingle string: every
    * shuffle moves 8-byte longs, and a collision would need two distinct
    * shingles colliding within one candidate pair's union (p ≈ |union|²/2⁶⁴
    * — vanishing), so jaccard over hashed-shingle space is the exact
    * string-space jaccard. Candidates come from the [[buildProfiles]]
    * prefix join — complete for pairs ≥ threshold, pruned in-join by the
    * PPJoin length/positional bounds ([[ppjoinFilter]]) — then verify
    * exactly via a native merge intersect over the full sorted hash arrays
    * ([[graft.functions.SortedIntersectCount]]) — candidate count is
    * prefix-bounded, never n².
    */
  private def minePairs(
      shingled: DataFrame, docs: DataFrame, idCol: String,
      threshold: Double, maxShingleDocFreq: CapSpec, withCounts: Boolean): DataFrame = {
    // explode_outer + null filter: see ngramJaccardAgainst — the inferred
    // generate filter would re-run the native shingle expression at the scan
    // `shingles` already carries the xxhash64 values (fused expressions,
    // r18) — the posting list explodes 8-byte longs, never strings
    val posting = shingled
      .select(col("doc_id"), explode_outer(col("shingles")).as("h"))
      .filter(col("h").isNotNull)
    // Persist the compact profile frame (arrays of longs, one row per doc):
    // the prefix explode and both verification joins read it, and the
    // alias-differing subtrees defeat exchange reuse. The raw posting list
    // is NOT persisted — its single consumer (the windowed df pass in
    // buildProfiles, r19) shuffles it exactly once.
    val prof = buildProfiles(posting, Seq("doc_id"), threshold,
        resolveCap(maxShingleDocFreq, docs, idCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pre = prof.select(col("doc_id"), col("n_shingles"), explode(col("prefix")).as("pe"))
      .select(col("doc_id"), col("n_shingles"), col("pe.h").as("h"), col("pe.pos").as("pos"))
    val a = pre.select(col("h"), col("doc_id").as("id_a"), col("n_shingles").as("na"),
      col("pos").as("pa"))
    val b = pre.select(col("h"), col("doc_id").as("id_b"), col("n_shingles").as("nb"),
      col("pos").as("pb"))
    val cand = a.join(b,
        a("h") === b("h") && col("id_a") < col("id_b") && ppjoinFilter(threshold))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val scored = cand
      .join(prof.select(col("doc_id").as("id_a"), col("hs").as("hs_a"),
        col("n_shingles").as("na")), Seq("id_a"))
      .join(prof.select(col("doc_id").as("id_b"), col("hs").as("hs_b"),
        col("n_shingles").as("nb")), Seq("id_b"))
      .withColumn("common", graft.functions.SortedIntersectCount(col("hs_a"), col("hs_b")))
      .withColumn("union_size", col("na") + col("nb") - col("common"))
      .withColumn("jaccard", col("common").cast("double") / col("union_size"))
      .filter(col("jaccard") >= threshold)
    if (withCounts)
      scored.select(col("id_a"), col("id_b"), col("common"), col("union_size"),
        round(col("jaccard"), 6).as("jaccard"))
    else
      scored.select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** N-gram overlap (contamination) scoring against a reference corpus —
    * the benchmark-decontamination primitive: for every document, the
    * fraction of its distinct word n-grams that appear anywhere in
    * `reference` (eval sets, held-out data). Docs above a small threshold
    * are contamination suspects.
    *
    * Plan shape at scale: the reference's distinct shingle hashes are a
    * compact single-column frame (benchmark sets are tiny next to a
    * training corpus — Catalyst broadcasts them; AQE decides otherwise when
    * not). The corpus explodes once, a left join against the reference set
    * marks matches, and a single per-doc aggregate counts totals and
    * matches together — one pass over the corpus, no corpus self-join,
    * nothing driver-side. Docs shorter than n words
    * have no shingles and score 0 over 0 shingles (reported, not dropped).
    */
  def ngramOverlapScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reference: DataFrame,
      refTextCol: String,
      n: Int = 8): DataFrame = {
    // explode_outer + null filter on both sides: the inferred generate
    // filter would re-run the shingle expression at the scan (see minePairs)
    val refHashes = spread(reference)
      .select(explode_outer(
        graft.functions.WordShingleHashes64(col(refTextCol), n)).as("h"))
      .filter(col("h").isNotNull)
      .distinct()
    val docHashes = spread(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.WordShingleHashes64(col(textCol), n).as("shingles"))
      .select(col("doc_id"), explode_outer(col("shingles")).as("h"))
      .filter(col("h").isNotNull)
    // one shingle pass: a left join against the (distinct) reference set
    // marks matches, and a single aggregate counts both totals — count(_m)
    // skips the nulls of unmatched shingles
    val agg = docHashes
      .join(refHashes.withColumn("_m", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("_m")).as("n_matched"))
    // every input doc gets a row: short docs (no shingles) score 0 over 0
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("overlap",
        col("n_matched").cast("double") / greatest(col("n_shingles"), lit(1L)))
  }

  /** Deterministic MinHash signature + banded LSH candidate pairs, verified
    * with exact Jaccard.
    *
    * Signature: h_i(x) = (a_i·x + b_i) mod p over the 32-bit shingle hash
    * x = crc32(shingle), with (a_i, b_i) drawn from a seeded PRNG — the
    * textbook universal-hash MinHash. Banding: `numHashes` rows split into
    * `bands`; docs sharing any (band index, band signature) bucket become
    * candidates — one shuffle join on the bucket key. Candidates are then
    * re-ranked with exact Jaccard so the output has no false positives;
    * recall is the standard LSH S-curve at (bands, rows).
    *
    * `maxBucketSize` drops band buckets holding more docs than the cap
    * before the self-join. A bucket of B docs is B² candidate pairs — a
    * mega-cluster of near-identical boilerplate would otherwise dominate the
    * whole job. Pairwise output is the wrong contract for such clusters
    * anyway: run [[exactByContent]] first, then pair-mine the survivors.
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      seed: Long = 42L,
      maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    // Mersenne prime 2^31-1: coefficients and hashes stay < 2^31, so a·x
    // tops out near 2^62 — no 64-bit overflow under ANSI arithmetic.
    val p = 2147483647L
    val rnd = new scala.util.Random(seed)
    val coef = Seq.fill(numHashes)((1 + rnd.nextLong(p - 1), rnd.nextLong(p)))

    // (no row filter on shingle count — see ngramJaccardPairs; empty docs
    // get null signatures below and fall out of the equi-join)
    //
    // Native MinHashSig: all k running minima update in ONE pass over the
    // shingle array with one CRC per shingle — same arithmetic as the
    // compositional array_min(transform(...)) × k form, minus k interpreted
    // array walks per document.
    val shingled = spread(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.WordShingles(col(textCol), n).as("shingles"))
      .withColumn("mh", graft.functions.MinHashSig(
        col("shingles"), coef.map(_._1), coef.map(_._2), p))
    val sigCols = (0 until numHashes).map(i => col("mh").getItem(i).as(s"h$i"))
    // Verification payload: the sorted xxhash64 array, not the shingle
    // strings — band-bucket shuffles move fixed 8-byte longs and candidate
    // verification is a native merge intersect (jaccard over hashed-shingle
    // space = string-space jaccard, see minePairs collision note).
    // Persisted for the same alias-only self-join reason as
    // ngramJaccardPairs.
    val signed = shingled
      .select(col("doc_id") +:
        sort_array(transform(col("shingles"), s => xxhash64(s))).as("shingles") +:
        sigCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // band buckets: hash the signature slice of each band; empty-shingle
    // docs carry null minhashes → null sig → dropped by the equi-join (so
    // degenerate docs can never form an all-pairs bucket)
    val bandCols = (0 until bands).map { bi =>
      val slice = (0 until rowsPerBand).map(r => col(s"h${bi * rowsPerBand + r}"))
      struct(lit(bi).as("band"),
        when(slice.head.isNull, lit(null).cast("long")).otherwise(xxhash64(slice: _*)).as("sig"))
    }
    val buckets0 = signed
      .select(col("doc_id"), col("shingles"), explode(array(bandCols: _*)).as("bucket"))
      .select(col("doc_id"), col("shingles"),
        col("bucket").getField("band").as("band"), col("bucket").getField("sig").as("sig"))
    // mega-bucket cut, built lazily into the plan (no eager count job at
    // construction time): the membership aggregate re-reads the persisted
    // signature frame and is empty under the cap; the oversize set is small
    // by construction → broadcast anti-join
    val buckets = maxBucketSize match {
      case Some(bcap) =>
        val hot = HotKeys.overCount(buckets0, Seq(col("band"), col("sig")), bcap)
        buckets0.join(broadcast(hot), Seq("band", "sig"), "left_anti")
      case None => buckets0
    }

    val a = buckets.select(col("band"), col("sig"), col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val b = buckets.select(col("band"), col("sig"), col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    val candidates = a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    // exact-verify candidates (candidate count is LSH-bounded, not n²)
    candidates
      .withColumn("common", graft.functions.SortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash of the document's word set.
    *
    * Each word votes ±1 on every bit of its 64-bit hash; the sign of the
    * per-bit sum is the fingerprint bit. Computed as 64 conditional sums
    * inside one hash aggregate — fully codegen'd, one shuffle on doc_id.
    *
    * Word-hash options: the default `xxhash64(word)` is the fast path (one
    * native hash per word). `portableHash = true` decodes the 64 bits from
    * the 16 leading hex chars of `md5(word)` instead — slightly more
    * expression work, but bit-for-bit reproducible in any engine with a
    * standard md5 (the oracle-checked q34 uses it so DuckDB can recompute
    * the exact fingerprints).
    *
    * @note Catalyst pushes the null filter below the projection, so the
    *       sketch expression evaluates twice per row in THIS form; the
    *       pairing path ([[simhashPairs]]) avoids that by filtering after
    *       its generate. When consuming signatures at scale, select the
    *       raw expression and handle nulls at the consumer instead.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      portableHash: Boolean = false): DataFrame =
    // Native one-pass SimHash64 expression: the sketch is a pure per-document
    // function, so it computes inside the scan stage — no word explode, no
    // shuffle, no 64-column aggregate (which was too wide for whole-stage
    // codegen and dominated the job). Wordless documents hash to null and
    // are dropped, matching the explode→aggregate form which emitted no row
    // for them.
    spread(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.SimHash64(col(textCol), portableHash).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** Near-dup pairs with Hamming distance ≤ `maxDistance` over SimHash.
    *
    * Pigeonhole blocking: split the 64-bit hash into `maxDistance + 1`
    * chunks — any pair within the distance must agree on at least one chunk,
    * so joining per-chunk finds all of them without an all-pairs scan.
    *
    * `maxBucketSize` drops chunk buckets above the cap (see
    * [[minhashLshPairs]] — identical-content mega-clusters belong to
    * [[exactByContent]], not a pairwise miner).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxDistance: Int = 3,
      maxBucketSize: Option[Int] = Some(10000), portableHash: Boolean = false): DataFrame = {
    // 16 bytes/doc — trivially cacheable at any scale; avoids running the
    // 64-sum hash aggregate once per self-join side. Deliberately NOT
    // simhash() (whose isNotNull filter gets pushed below the projection
    // and re-runs the sketch inside a scan Filter — 2× the dominant cost);
    // wordless docs keep their null signature here and die on the cheap
    // post-explode bits filter, which cannot be pushed through the Generate.
    val hashed = spread(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.SimHash64(col(textCol), portableHash).as("simhash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    hamming64Pairs(hashed, "doc_id", "simhash", maxDistance, maxBucketSize)
  }

  /** Near-dup pairs with Hamming distance ≤ `maxDistance` over ANY 64-bit
    * signature column — the pigeonhole chunk join of [[simhashPairs]],
    * signature-agnostic so image perceptual hashes
    * ([[Multimodal.perceptualHash]]), portable md5 sketches, or any other
    * 64-bit fingerprint mine pairs through the same bounded plan. Null
    * signatures die on the cheap post-explode bits filter (which cannot
    * be pushed through the Generate and re-derive upstream work).
    */
  def hamming64Pairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxDistance: Int = 3, maxBucketSize: Option[Int] = Some(10000)): DataFrame = {
    require(maxDistance >= 0 && maxDistance <= 15, "maxDistance out of range")
    val chunks = maxDistance + 1
    val bitsPer = 64 / chunks
    val hashed = sigs.select(col(idCol).as("doc_id"), col(sigCol).as("simhash"))
    val keyed0 = hashed.select(col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * bitsPer)
            .bitwiseAND((1L << bitsPer) - 1).as("bits"))
      }: _*)).as("key"))
      .filter(col("key.bits").isNotNull)
    val keyed = maxBucketSize match {
      case Some(bcap) =>
        val hot = HotKeys.overCount(keyed0, Seq(col("key")), bcap)
        keyed0.join(broadcast(hot), Seq("key"), "left_anti")
      case None => keyed0
    }
    val a = keyed.select(col("key"), col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = keyed.select(col("key"), col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      // distance filter BEFORE the dedup shuffle: bit_count is free map-side
      // work, and pairs beyond the radius (the vast majority) never enter
      // the dropDuplicates exchange
      .withColumn("distance", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("distance") <= maxDistance)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "distance")
  }

  /** Edit-distance (Levenshtein ≤ `maxDist`) pairs over a SHORT-string
    * column — fuzzy key matching for titles, names, URLs, product strings
    * (for document bodies use the Jaccard/MinHash miners; edit distance is
    * the wrong metric there and the full strings ride through the join
    * here).
    *
    * Candidate generation is Ed-Join-style q-gram prefix filtering (Xiao,
    * Wang, Lin 2008 "Ed-Join", VLDB — public method): one edit operation
    * changes at most `q` of a string's q-grams, so two strings within
    * `maxDist` edits differ in at most `maxDist·q` distinct grams — if the
    * `maxDist·q + 1` globally-RAREST grams of each side share nothing, the
    * pair is provably beyond the radius. Candidates therefore come from an
    * equi-join on prefix grams only (rare by construction — the hot grams
    * that would explode a plain gram join never enter a prefix), pruned
    * in-join by the length bound |len_a − len_b| ≤ maxDist, then verified
    * exactly with the codegen'd `levenshtein` (with its max-distance
    * argument, so verification bails out after the banded DP proves the
    * bound — O(maxDist·len), not O(len²)).
    *
    * Scale shape: gram frequency is one bounded-key aggregate; the per-doc
    * prefix pick is a window over ~len rows per doc; the candidate join
    * shuffles prefix postings (≤ maxDist·q+1 per doc).
    *
    * Completeness bound: the gram path is provably complete only when the
    * pair's LONGER side has ≥ q·(maxDist+1) chars — below that, the
    * count-filter floor max|G| − maxDist·q hits zero and two strings
    * within the radius can share NO q-gram at all (e.g. "abc"/"abd" at
    * maxDist 1, q 3), never mind a prefix gram. The whole
    * length ≤ q·(maxDist+1)−1 stratum (which also covers gram-less sub-q
    * strings) therefore pairs via Pass-Join segment blocking (Li, Deng,
    * Feng 2011 "PASS-JOIN", PVLDB — public method): the shorter side
    * splits into maxDist+1 segments, and since maxDist edits can touch at
    * most maxDist of them, some segment survives VERBATIM in the longer
    * side, shifted by at most maxDist — so candidates come from an
    * equi-join of (short-length, segment-index, segment) keys against the
    * longer side's same-length substrings in the position window, then
    * the same banded-DP verification. Buckets are keyed on segment
    * CONTENT, so a corpus dominated by short strings (tokens, codes)
    * fans out by actual character overlap, not |corpus-per-length|²
    * (the round-9 ADVICE degenerate case); per string the blocking emits
    * O(maxDist²) probes — a constant. Sub-segment-length strings
    * (< maxDist+1 chars, where a segment is empty) still fall back to
    * their length band; their keyspace is |Σ|^len-bounded and the true
    * output there is quadratic anyway.
    */
  def editDistancePairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q-gram width must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val all = spread(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("txt"))
      .filter(col("txt").isNotNull)
    val base = all.filter(length(col("txt")) >= q)
    val posting = base.select(col("doc_id"),
      explode(array_distinct(graft.functions.CharShingles(col("txt"), q, 1))).as("g"))
    // global frequency order, ties by gram text — both sides must rank
    // prefixes under ONE total order for the filter lemma to hold.
    // groupBy + join-back is the RIGHT shape here, unlike
    // buildProfiles/Spans (r19): q-gram vocabularies are |Σ|^q-bounded and
    // tiny next to the posting list, so the freq side broadcasts (checked:
    // BroadcastHashJoin BuildRight in the q117 plan) and the posting list
    // is never exchanged for the df attachment — a window would force a
    // full posting exchange for the same values (measured +5% at sf0.1).
    val freq = posting.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    val prefix = posting.join(freq, Seq("g"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxDist * q + 1)
      .select(col("doc_id"), col("g"))
    val withTxt = prefix.join(
      base.withColumn("len", length(col("txt"))), Seq("doc_id"))
    // distinct key names per side: self-join disambiguation is Spark's job,
    // but explicit aliases keep the plan unambiguous (and silence the
    // trivially-true-predicate warning a shared attribute id triggers)
    val a = withTxt.select(col("g").as("ga"), col("doc_id").as("id_a"),
      col("txt").as("ta"), col("len").as("la"))
    val b = withTxt.select(col("g").as("gb"), col("doc_id").as("id_b"),
      col("txt").as("tb"), col("len").as("lb"))
    // verify BEFORE the pair-dedup exchange: a candidate surviving on 2+
    // shared prefix grams re-runs the (cheap, banded) DP, but the
    // dropDuplicates shuffle then carries only TRUE pairs — far fewer than
    // candidates on dense vocabularies
    val mainPairs = a.join(b, col("ga") === col("gb") && col("id_a") < col("id_b") &&
        abs(col("la") - col("lb")) <= maxDist)
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .filter(col("dist") >= 0) // levenshtein(..., max) returns -1 beyond the bound
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("dist"))

    // short stratum (see scaladoc): every pair whose longer side is below
    // q·(maxDist+1) must come from this Pass-Join segment blocking — the
    // gram path cannot guarantee them a shared candidate gram
    val shortBound = q * (maxDist + 1) - 1
    val k = maxDist + 1
    val short = all.filter(length(col("txt")) <= shortBound)
    // segment i of a length-l string under the even split (first segments
    // floor(l/k) chars, last l%k segments one longer): start/len as columns
    def segLen(l: Column, i: Column): Column =
      (l / k).cast("int") + when(i >= lit(k) - (l % k), 1).otherwise(0)
    def segStart(l: Column, i: Column): Column =
      i * (l / k).cast("int") + greatest(i - (lit(k) - (l % k)), lit(0))
    // A side: each string of segmentable length as the SHORTER role,
    // keyed by its own segments
    val segA = short.filter(length(col("txt")) >= k)
      .select(col("doc_id").as("id_a"), col("txt").as("ta"),
        length(col("txt")).as("lshort"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select(col("id_a"), col("ta"), col("lshort"), col("i"),
        substring(col("ta"), segStart(col("lshort"), col("i")) + 1,
          segLen(col("lshort"), col("i"))).as("seg"))
    // B side: each string as the LONGER role probes, for every plausible
    // shorter length and segment, its same-length substrings within the
    // ±maxDist position window — O(maxDist²) rows per string, keyed by
    // CONTENT so buckets fan out by real character overlap. The position
    // window is non-empty by construction: segStart + segLen ≤ lshort ≤
    // len(tb), so min(segStart+maxDist, len−segLen) ≥ max(segStart−maxDist, 0).
    val segB = short
      .select(col("doc_id").as("id_b"), col("txt").as("tb"),
        explode(sequence(greatest(length(col("txt")) - maxDist, lit(0)),
          length(col("txt")))).as("lshort"))
      .filter(col("lshort") >= k)
      .select(col("id_b"), col("tb"), col("lshort"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select(col("id_b"), col("tb"), col("lshort"), col("i"),
        explode(sequence(
          greatest(segStart(col("lshort"), col("i")) - maxDist, lit(0)),
          least(segStart(col("lshort"), col("i")) + maxDist,
            length(col("tb")) - segLen(col("lshort"), col("i"))))).as("p"))
      .select(col("id_b"), col("tb"), col("lshort"), col("i"),
        substring(col("tb"), col("p") + 1,
          segLen(col("lshort"), col("i"))).as("seg"))
    // sub-segment strings (an empty segment carries no signal): dense
    // length-band fallback over a |Σ|^len-bounded keyspace
    val tiny = short.filter(length(col("txt")) < k)
    val tinyPairs = tiny
      .select(col("doc_id").as("id_a"), col("txt").as("ta"),
        length(col("txt")).as("band"))
      .join(short.select(col("doc_id").as("id_b"), col("txt").as("tb"),
          explode(sequence(greatest(length(col("txt")) - maxDist, lit(0)),
            length(col("txt")) + maxDist)).as("band")),
        Seq("band"))
      .select(col("id_a"), col("ta"), col("id_b"), col("tb"))
    val segPairs = segA.join(segB, Seq("lshort", "i", "seg"))
      .select(col("id_a"), col("ta"), col("id_b"), col("tb"))
    val shortPairs = segPairs.unionByName(tinyPairs)
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("dist", levenshtein(col("ta"), col("tb"), maxDist))
      .filter(col("dist") >= 0)
      .select(
        when(col("id_a") < col("id_b"), col("id_a")).otherwise(col("id_b")).as("id_a"),
        when(col("id_a") < col("id_b"), col("id_b")).otherwise(col("id_a")).as("id_b"),
        col("dist"))
      .dropDuplicates("id_a", "id_b")

    // the strata overlap in [q, shortBound]: a short pair that DOES share a
    // prefix gram arrives from both paths — dedupe on the pair key
    mainPairs.unionByName(shortPairs).dropDuplicates("id_a", "id_b")
  }
}
