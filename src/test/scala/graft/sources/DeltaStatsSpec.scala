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

  // r17 (ADVICE): a millisecond-precision stats max (delta-spark's
  // serialization truncates downward) must be padded on the hi side —
  // the file's true max may lie in the dropped sub-millisecond.
  test("ms-truncated stats max pads +999µs before hi-side comparison") {
    val iv = DeltaStats.ColInterval(
      Some("2024-01-05T00:00:00.000Z"), Some("2024-01-05T01:00:00.000Z"),
      nullsPossible = false, allNull = false)
    val in = java.time.Instant.parse("2024-01-05T01:00:00.000500Z")
    assert(DeltaStats.mayContain(iv, TimestampType, in, in, inHasNull = false),
      "probe inside the truncated sub-millisecond must keep the file")
    val past = java.time.Instant.parse("2024-01-05T01:00:00.001Z")
    assert(!DeltaStats.mayContain(iv, TimestampType, past, past, inHasNull = false),
      "probe past the padded window still prunes")
  }

  test("full-micros stats max (this engine's format) pads nothing") {
    val iv = DeltaStats.ColInterval(
      Some("2024-01-05T00:00:00.000000Z"), Some("2024-01-05T01:00:00.000000Z"),
      nullsPossible = false, allNull = false)
    val just = java.time.Instant.parse("2024-01-05T01:00:00.000001Z")
    assert(!DeltaStats.mayContain(iv, TimestampType, just, just, inHasNull = false))
  }

  test("bare-seconds stats max pads the whole second; exact partition values do not") {
    val stats = DeltaStats.ColInterval(
      Some("2024-01-05 00:00:00"), Some("2024-01-05 01:00:00"),
      nullsPossible = false, allNull = false)
    val in = java.time.Instant.parse("2024-01-05T01:00:00.999999Z")
    assert(DeltaStats.mayContain(stats, TimestampType, in, in, inHasNull = false))
    val part = stats.copy(hiExact = true)
    assert(!DeltaStats.mayContain(part, TimestampType, in, in, inHasNull = false),
      "a partition value IS the value — sub-second probes above it prune")
  }
}
