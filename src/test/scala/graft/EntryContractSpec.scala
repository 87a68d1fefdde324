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

  test("every oracle entry has a query; rows-only queries are the documented three") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphaned oracle entries: ${(o -- q).mkString(", ")}")
    val rowsOnly = q -- o
    assert(rowsOnly == Set("q27_approx_agg", "q36_ann_lsh", "q48_ann_ivf"),
      s"rows-only set changed: ${rowsOnly.mkString(", ")} — every new query needs an oracle " +
        "unless its output is inherently engine-specific (and then document it here)")
  }

  test("oracle SQL is non-empty and names every aliased column on both sides") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name oracle is empty")
      assert(sql.toUpperCase.contains("SELECT"), s"$name oracle is not a query")
    }
  }
}
