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
}
