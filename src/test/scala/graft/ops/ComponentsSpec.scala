package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labels(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find for cross-checking. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents: chain contracts to its minimum") {
    // path graph 1-2-3-4-5 plus a separate pair and a triangle
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L),
      (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
    val got = labels(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents: matches union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextLong(200), rnd.nextLong(200)))
      .filter { case (a, b) => a != b }
    assert(labels(edges) == brute(edges))
  }

  test("r18 dispatch: driver union-find equals the distributed contraction") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(600)((rnd.nextLong(300), rnd.nextLong(300)))
      .filter { case (a, b) => a != b }
    val driver = labels(edges) // default cap: driver path
    spark.conf.set("graft.components.driverMaxEdges", "0")
    val dist =
      try labels(edges) // cap 0: distributed loop
      finally spark.conf.unset("graft.components.driverMaxEdges")
    assert(driver == dist)
    assert(driver == brute(edges))
  }

  test("connectedComponents: self-loops and duplicates are harmless; empty in, empty out") {
    val got = labels(Seq((1L, 1L), (2L, 3L), (3L, 2L), (2L, 3L)))
    assert(got == Map(2L -> 2L, 3L -> 2L))
    assert(labels(Seq.empty) == Map.empty)
  }

  test("labelNodes: total labeling, isolated nodes label themselves") {
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("x", "y")
    val got = Components.labelNodes(nodes, "id", edges, "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    // canonical-doc filter shape
    val keep = Components.labelNodes(nodes, "id", edges, "x", "y")
      .filter(col("id") === col("component")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(keep == Set(1L, 9L))
  }

  test("connectedComponents: string ids use lexicographic ordering") {
    val edges = Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("s", "d")
    val got = Components.connectedComponents(edges, "s", "d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("connectedComponents: long path needs multiple rounds, still exact") {
    // 0-1-2-...-63: worst case for naive propagation; star alternation
    // contracts it in O(log n) rounds
    val edges = (0L until 63L).map(i => (i + 1, i))
    val got = labels(edges)
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("connectedComponents: per-round checkpoint blocks are freed, not accumulated") {
    // Dataset.unpersist is a no-op for localCheckpoint blocks (it only
    // clears CacheManager entries) — the contraction loop must free each
    // superseded round at the RDD level or a long run holds every round's
    // edge set in the block manager. A 64-node path takes several rounds;
    // after the run at most the final round (+ its predecessor, freed
    // non-blocking) may still be registered.
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val edges = (0L until 63L).map(i => (i + 1, i))
    labels(edges)
    val leftover = sc.getPersistentRDDs.keySet -- before
    assert(leftover.size <= 2,
      s"${leftover.size} checkpoint RDDs still registered after convergence")
  }
}
