package graft.ops

import graft.functions.Text
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
object Dedup {

  /** Ensure enough partitions to parallelize expression-heavy per-row work.
    * Single-file/single-row-group local inputs scan as ONE partition, which
    * serializes shingling onto one core; on a real multi-file table this is
    * a no-op (the scan already has ≥ cluster parallelism).
    */
  private[ops] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
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

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.
    *
    * Inverted-index join: doc→distinct shingles→explode; self-join on the
    * shingle key with `id_a < id_b`; |A∩B| = count of shared shingles;
    * |A∪B| = |A|+|B|-|A∩B|. Output: (id_a, id_b, jaccard) with
    * jaccard ≥ `threshold`.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    // Native WordShingles expression: codegen'd single-pass shingling. (The
    // composed functions._ form is interpreted per-lambda-element AND gets
    // cloned into scan filters by InferFiltersFromGenerate + pushdown;
    // measured 3-4× slower.) No `size > 0` row filter: explode() drops
    // empty arrays for free.
    val shingled = spread(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.WordShingles(col(textCol), n).as("shingles"))
      .withColumn("n_shingles", size(col("shingles")))

    // Persist the exploded inverted index: both sides of the self-join below
    // read it, and the two subtrees differ only by alias, so Catalyst cannot
    // reuse the exchange — without this the scan + shingling + explode all
    // run twice. DISK spill keeps the persisted posting list safe at scale.
    val inverted0 = shingled
      .select(col("doc_id"), col("n_shingles"), explode(col("shingles")).as("shingle"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val inverted = maxShingleDocFreq match {
      case Some(cap) =>
        // stop-shingle cut: bound join fan-out on pathological shared shingles
        val freq = inverted0.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
        inverted0.join(freq.select("shingle"), "shingle")
      case None => inverted0
    }

    val a = inverted.select(
      col("shingle"), col("doc_id").as("id_a"), col("n_shingles").as("na"))
    val b = inverted.select(
      col("shingle"), col("doc_id").as("id_b"), col("n_shingles").as("nb"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
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
    */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    // Mersenne prime 2^31-1: coefficients and hashes stay < 2^31, so a·x
    // tops out near 2^62 — no 64-bit overflow under ANSI arithmetic.
    val p = 2147483647L
    val rnd = new scala.util.Random(seed)
    val coef = Seq.fill(numHashes)((1 + rnd.nextLong(p - 1), rnd.nextLong(p)))

    // (no row filter on shingle count — see ngramJaccardPairs; empty docs
    // get null signatures below and fall out of the equi-join)
    val shingled = spread(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.WordShingles(col(textCol), n).as("shingles"))
      // hash each shingle ONCE; the k hash functions then run over ints,
      // not k× re-hashed strings
      .withColumn("hs", transform(col("shingles"), s => crc32(s) % p))

    // minhash_i = min over shingle hashes of (a_i * x + b_i) mod p
    val sigCols = coef.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hs"), x => (x * a + b) % p)).as(s"h$i")
    }
    // persisted for the same alias-only self-join reason as ngramJaccardPairs
    val signed = shingled.select(col("doc_id") +: col("shingles") +: sigCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // band buckets: hash the signature slice of each band; empty-shingle
    // docs carry null minhashes → null sig → dropped by the equi-join (so
    // degenerate docs can never form an all-pairs bucket)
    val bandCols = (0 until bands).map { bi =>
      val slice = (0 until rowsPerBand).map(r => col(s"h${bi * rowsPerBand + r}"))
      struct(lit(bi).as("band"),
        when(slice.head.isNull, lit(null).cast("long")).otherwise(xxhash64(slice: _*)).as("sig"))
    }
    val buckets = signed
      .select(col("doc_id"), col("shingles"), explode(array(bandCols: _*)).as("bucket"))
      .select(col("doc_id"), col("shingles"),
        col("bucket").getField("band").as("band"), col("bucket").getField("sig").as("sig"))

    val a = buckets.select(col("band"), col("sig"), col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val b = buckets.select(col("band"), col("sig"), col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    val candidates = a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    // exact-verify candidates (candidate count is LSH-bounded, not n²)
    candidates
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash of the document's word set.
    *
    * Each word votes ±1 on every bit of its xxhash64; the sign of the per-bit
    * sum is the fingerprint bit. Computed as 64 conditional sums inside one
    * hash aggregate — fully codegen'd, one shuffle on doc_id.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = spread(docs)
      .select(col(idCol).as("doc_id"), explode(Text.words(col(textCol))).as("word"))
      .withColumn("wh", xxhash64(col("word")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("wh"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val summed = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    summed.select(col("doc_id"), sh.as("simhash"))
  }

  /** Near-dup pairs with Hamming distance ≤ `maxDistance` over SimHash.
    *
    * Pigeonhole blocking: split the 64-bit hash into `maxDistance + 1`
    * chunks — any pair within the distance must agree on at least one chunk,
    * so joining per-chunk finds all of them without an all-pairs scan.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val bitsPer = 64 / chunks
    // 16 bytes/doc — trivially cacheable at any scale; avoids running the
    // 64-sum hash aggregate once per self-join side
    val hashed = simhash(docs, idCol, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    val keyed = hashed.select(col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * bitsPer)
            .bitwiseAND((1L << bitsPer) - 1).as("bits"))
      }: _*)).as("key"))
    val a = keyed.select(col("key"), col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = keyed.select(col("key"), col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("distance", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("distance") <= maxDistance)
      .select("id_a", "id_b", "distance")
  }
}
