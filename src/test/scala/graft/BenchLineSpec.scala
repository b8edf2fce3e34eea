package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the driver's bounded tail capture: the Bench
  * JSON line is parsed out of the LAST 2000 characters of sbt output,
  * and the registry is one expansion away from overflowing it again
  * (r07/r08 both lost the line's head). This spec renders the line for
  * the REAL registry's query names under pessimistic-but-plausible
  * values and fails the build before the driver run would truncate. */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("bench JSON line fits the driver's 2000-char tail window at contended-run magnitudes") {
    // worst realistic shape: every query double-digit seconds (1
    // decimal → 4 chars), total in the hundreds, loads double-digit
    val line = Bench.renderLine(names.map(_ -> 77.7), "sf0.1",
      repeats = 4, contended = true, loadStart = 12.34, loadEnd = 23.45)
    assert(line.length < 2000,
      s"bench line ${line.length} chars for ${names.size} queries — " +
        "the driver tail-captures 2000; shorten keys or values")
    // headroom note: fail early (not at exactly 2000) so a couple more
    // registry entries still fit before anything truncates; at 76
    // queries the worst case renders ~1918, so the band is 1960 — the
    // NEXT expansion must shorten keys or values first
    assert(line.length < 1960,
      s"bench line ${line.length} chars — under 2000 but inside the " +
        "guard band; plan the next registry expansion's budget now")
  }

  test("bench JSON line fits even with every query failed") {
    val line = Bench.renderLine(names.map(_ -> -1.0), "sf0.001",
      repeats = 2, contended = false, loadStart = 0.5, loadEnd = 0.5)
    assert(line.length < 2000)
  }

  test("ms formatting stays compact and driver-parseable") {
    assert(Bench.ms(-1.0) == "-1")
    assert(Bench.ms(0.0) == "0")
    assert(Bench.ms(1.234) == "1.23")
    assert(Bench.ms(9.996) == "10")     // rounds up across the 10 s knee
    assert(Bench.ms(42.14) == "42")     // whole seconds past 10 s
    assert(Bench.ms(177.7) == "178")
    assert(Bench.ms(0.004) == "0")      // strips to the shortest form
  }
}
