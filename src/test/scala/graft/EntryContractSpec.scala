package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry: map merges must not silently
  * shadow queries, and every oracle row must point at a real query — a
  * collision here would quietly shrink the correctness surface.
  */
class EntryContractSpec extends AnyFunSuite {

  test("query names are collision-free across rounds") {
    val overlap = SparkEntry.coreQueries.keySet intersect EngineQueries.queries.keySet
    assert(overlap.isEmpty,
      s"core and engine queries share names (silently shadowed in ++): ${overlap.mkString(", ")}")
  }

  test("every oracle entry has a query; every query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphaned oracle entries: ${(o -- q).mkString(", ")}")
    // zero rows-only queries since round 5: the pruned-ANN configs carry
    // full signature/centroid-replay oracles and q27 emits its sketch
    // results in exactly-checkable form
    assert((q -- o).isEmpty,
      s"rows-only queries: ${(q -- o).mkString(", ")} — every query needs an oracle")
  }

  test("oracle SQL is non-empty and names every aliased column on both sides") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
      assert(sql.toUpperCase.contains("SELECT"), s"$name oracle is not a query")
    }
  }

  // Bench's frozen per-round subsets must stay an exact partition of the
  // query surface: if a new query lands without being recorded in the
  // CURRENT round's set, older rounds' subset totals silently absorb it and
  // cross-round regression attribution breaks (ADVICE r5: q96-q99 were
  // missing from r5New). The r2-era remainder is pinned by its numeric
  // prefix range (p01-p06, q01-q56) and exact size, so any unregistered
  // addition — necessarily numbered past those ranges — fails here.
  test("bench round subsets partition SparkEntry.queries exactly") {
    val q = SparkEntry.queries.keySet
    val rounds = Bench.laterRounds
    rounds.combinations(2).foreach { case Seq(a, b) =>
      assert((a intersect b).isEmpty, s"round sets overlap: ${(a intersect b).mkString(", ")}")
    }
    rounds.foreach { s =>
      assert(s.subsetOf(q), s"round set names unknown queries: ${(s -- q).mkString(", ")}")
    }
    val r2Era = q -- rounds.flatten
    assert(Bench.r1Names.subsetOf(r2Era), "r1 names leaked into a later round set")
    def num(n: String): Int = n.drop(1).takeWhile(_.isDigit).toInt
    val strays = r2Era.filterNot { n =>
      (n.startsWith("p") && num(n) <= 6) || (n.startsWith("q") && num(n) <= 56)
    }
    assert(strays.isEmpty,
      s"queries not registered in any round's new-set (add them to Bench.r6New): ${strays.mkString(", ")}")
    assert(r2Era.size == 62, s"r2-era surface changed size: ${r2Era.size} != 62")
  }
}
