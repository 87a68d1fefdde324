package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Timestamp stats comparison ([[DeltaStats.cmp]], r16): values parse to
  * INSTANTS, so mixed-precision and mixed-spelling stats (this engine's
  * micros, delta-spark's millis, naive forms) order chronologically —
  * lexicographic comparison would invert "...000Z" vs "...000123Z".
  */
class DeltaStatsSpec extends AnyFunSuite {

  private def c(a: Any, b: Any): Option[Int] = DeltaStats.cmp(TimestampType, a, b)

  test("ISO micro vs milli precision orders chronologically, not lexically") {
    // lexicographically "...000Z" > "...000123Z" ('Z' > '1') — must not matter
    assert(c("2024-01-05T01:00:00.000Z", "2024-01-05T01:00:00.000123Z")
      .exists(_ < 0))
    assert(c("2024-01-05T01:00:00.000123Z", "2024-01-05T01:00:00.000Z")
      .exists(_ > 0))
    assert(c("2024-01-05T01:00:00.000Z", "2024-01-05T01:00:00Z").contains(0))
  }

  test("naive spellings assume UTC; hive partition form parses") {
    assert(c("2024-01-05T01:00:00", "2024-01-05T01:00:00.000Z").contains(0))
    assert(c("2024-01-05 01:00:00", "2024-01-05T02:00:00Z").exists(_ < 0))
  }

  test("instants (literal probes) compare against string stats") {
    val i = java.time.Instant.parse("2024-01-05T01:30:00Z")
    assert(c(i, "2024-01-05T01:00:00.000000Z").exists(_ > 0))
    assert(c(i, "2024-01-05T02:00:00.000000Z").exists(_ < 0))
  }

  test("garbage keeps the file (None, never a wrong order)") {
    assert(c("not-a-timestamp", "2024-01-05T01:00:00Z").isEmpty)
  }
}
