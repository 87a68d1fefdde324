package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components — the canonical post-pair-mining step
  * of a dedup pipeline: near-dup PAIRS (from [[Dedup.ngramJaccardPairs]],
  * [[Dedup.minhashLshPairs]], [[Dedup.simhashPairs]], ...) become GROUPS,
  * each document labeled with the minimum id of its transitive near-dup
  * cluster, so "keep one per cluster" is a single filter.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round is
  * a fixed number of shuffles on the node key, labels only ever decrease,
  * and the edge set converges to a star forest — min-id root per component
  * — in O(log² n) rounds (O(log n) in practice; near-dup graphs, whose
  * components are small clusters, converge in 2-3).
  *
  * Scale notes (the 100 TB story):
  *   - No driver-side graph state: the driver loop only compares an
  *     8-byte-per-round convergence signature (count + xor of edge
  *     hashes, one aggregate job); edges never leave the cluster.
  *   - Each round's frame is `localCheckpoint`ed: lineage is truncated, so
  *     round N's plan doesn't re-analyze rounds 1..N-1 (iterative
  *     DataFrame loops otherwise go quadratic in planning time).
  *   - Star operations are window aggregates over the node key —
  *     hash-partitioned, no broadcast of anything graph-sized. A
  *     mega-component (boilerplate cluster) costs its own size per round,
  *     not n².
  */
object Components {

  /** (node, component) for every node incident to an edge, where
    * `component` is the minimum node id (by the column's natural ordering)
    * in the node's connected component. Self-loops are ignored; isolated
    * nodes (absent from `edges`) are absent from the output — left-join
    * and coalesce to self for a total labeling.
    *
    * Throws after `maxRounds` non-converged rounds (default 50 ≫ the
    * O(log² n) bound for any realistic n) rather than returning a
    * partially-contracted labeling.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 50): DataFrame = {
    // canonical undirected edge (big, small), self-loops dropped
    // lazy localCheckpoint: the signature aggregate below is the action
    // that materializes AND truncates each round — one job per round, not
    // an eager-checkpoint job plus a signature job
    // DISK_ONLY checkpoint blocks: each round's edge set is read back
    // exactly once (next round's shuffle), so caching it in unified memory
    // buys nothing and competes with the very sorts/joins that need the
    // heap — on the 2 GiB sf1 soak envelope that competition was the
    // q66 spill-read OOM (r14 ledger)
    val ckptLevel = StorageLevel.DISK_ONLY
    var e = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(eager = false, ckptLevel)

    // Small-graph dispatch (r18): the contraction loop costs ~2 Spark jobs
    // per round; a near-dup graph whose DISTINCT canonical edge set fits
    // the driver comfortably contracts in microseconds with union-find —
    // by construction the same labeling (min id per component). A bounded
    // COUNT off the already-checkpointed edge frame decides, then small
    // graphs collect; larger graphs (the 100 TB case) run the distributed
    // loop unchanged on the same cached blocks without ever shipping a
    // cap-sized head to the driver. Integral ids only — other orderable
    // types keep the distributed path rather than re-deriving Spark's
    // ordering per type. ComponentsSpec pins both paths against each
    // other on random graphs.
    val spark = edges.sparkSession
    val driverCap = spark.conf.getOption("graft.components.driverMaxEdges")
      .map(_.toInt).getOrElse(500000)
    val integral = e.schema("u").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => true
      case _ => false
    }
    if (integral && driverCap > 0) {
      // COUNT the bounded head before collecting it (r19): the count ships
      // one long back, so a huge graph no longer pays a cap-sized Row
      // collect (driver garbage) just to learn it must take the
      // distributed path. Small graphs pay one extra tiny job that reads
      // the blocks the first action just checkpointed.
      val fits = e.limit(driverCap + 1).count() <= driverCap
      val head = if (fits) e.limit(driverCap + 1).collect()
                 else Array.empty[org.apache.spark.sql.Row]
      if (fits) {
        val intType = e.schema("u").dataType ==
          org.apache.spark.sql.types.IntegerType
        def idOf(v: Any): Long = v match {
          case i: java.lang.Integer => i.longValue(); case l: java.lang.Long => l
        }
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        head.foreach { r =>
          val u = idOf(r.get(0)); val v = idOf(r.get(1))
          parent.putIfAbsent(u, u); parent.putIfAbsent(v, v)
          val ru = find(u); val rv = find(v)
          if (ru != rv) parent.put(math.max(ru, rv), math.min(ru, rv))
        }
        val minOf = new java.util.HashMap[Long, Long]()
        parent.keySet().forEach { n =>
          minOf.merge(find(n), n, (a, b) => math.min(a, b))
        }
        uncheckpoint(e)
        val rows = new scala.collection.mutable.ArrayBuffer[
          org.apache.spark.sql.Row](parent.size)
        parent.keySet().forEach { n =>
          val c = minOf.get(find(n))
          rows += (if (intType) org.apache.spark.sql.Row(n.toInt, c.toInt)
                   else org.apache.spark.sql.Row(n, c))
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", e.schema("u").dataType),
          org.apache.spark.sql.types.StructField("component", e.schema("u").dataType)))
        return spark.createDataFrame(
          java.util.Arrays.asList(rows.toSeq: _*), schema)
      }
    }

    def signature(df: DataFrame): (Long, Long) = {
      val r = df.select(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var sig = signature(e)
    var round = 0
    var converged = false
    while (!converged) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxRounds rounds")
      val next = smallStar(largeStar(e)).distinct()
        .localCheckpoint(eager = false, ckptLevel)
      val nextSig = signature(next) // materializes next's checkpoint blocks
      // the previous round's blocks are dead weight once next is
      // materialized — without this, a long contraction holds EVERY
      // round's edge set in the block manager and strangles task memory
      // on small heaps (2g soak OOM, round 10); with it, storage is
      // bounded by two rounds at any iteration count. Dataset.unpersist
      // only drops CacheManager entries, NOT the RDD blocks localCheckpoint
      // creates — free those at the RDD level, via the LogicalRDD node the
      // checkpoint left behind (safe: `e` is never evaluated again).
      uncheckpoint(e)
      converged = nextSig == sig
      sig = nextSig
      e = next
    }
    // fixed point is a star forest: every edge is (node, root); roots have
    // no outgoing (u, v) edge, so they re-enter as their own component
    e.select(col("u").as("node"), col("v").as("component"))
      .unionAll(
        e.select(col("v").as("node"), col("v").as("component")).distinct())
  }

  /** Drops the block-manager storage of a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` routes to `CacheManager.uncacheQuery`, which only
    * removes `persist()`/`cache()` entries — the RDD-level blocks a local
    * checkpoint pins stay cached until the ContextCleaner GCs the handle.
    * The checkpointed Dataset's analyzed plan is a single [[LogicalRDD]]
    * leaf; unpersist that RDD directly. The Dataset must not be evaluated
    * afterwards (its checkpoint data is gone).
    */
  private def uncheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Large-star: for each node u, connect every LARGER neighbor to
    * m = min(Γ(u) ∪ {u}). Emitted edges (v, m) keep the (big, small)
    * canonical orientation because v > u ≥ m.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    sym
      .withColumn("m", least(min(col("v")).over(Window.partitionBy("u")), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: for each node u with smaller neighbors N = {v ∈ Γ(u),
    * v < u}, connect u and every v ∈ N to m = min(N). Input and output are
    * canonically (big, small) oriented, so Γ<(u) is exactly the rows keyed
    * by u — no symmetrize pass. With the window ordered by v ascending, the
    * running min IS the partition min m on every row, and the first row
    * (v = m, whose (v, m) edge would be a self-loop) instead emits the
    * (u, m) edge — exactly one output edge per input row, one WindowExec.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("u").orderBy("v")
    e.select(col("u"), col("v"),
        min(col("v")).over(w).as("m"),
        row_number().over(w).as("rn"))
      .select(
        when(col("rn") === 1, col("u")).otherwise(col("v")).as("u"),
        col("m").as("v"))
  }

  /** Total labeling over a node frame: every row of `nodes` gets the
    * component of its id — min id of its near-dup cluster, or itself when
    * isolated. The standard "canonical document per cluster" shape:
    * `keep = labeled.filter(col(idCol) === col("component"))`.
    */
  def labelNodes(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val comp = connectedComponents(edges, srcCol, dstCol)
    nodes.join(comp, nodes(idCol) === comp("node"), "left")
      .drop("node")
      .withColumn("component", coalesce(col("component"), col(idCol)))
  }
}
