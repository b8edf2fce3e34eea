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

  test("the emitted bench line fits the driver's 2000-char tail window on EVERY profile") {
    // adversarial profiles against the real registry's key set: all
    // values at the widest fine rendering (0.99 → "0.99"), all just
    // under 10 s, the r9 driver run's realistic contended shape, and
    // an all-failed run — renderFitting must keep each under budget
    // (degrading precision when the fine rendering would overflow)
    val profiles = Seq(
      "all sub-second" -> names.map(_ -> 0.99),
      "all near-10s" -> names.map(_ -> 9.94),
      "realistic contended" ->
        names.zipWithIndex.map { case (n, i) => n -> (if (i % 4 == 0) 3.91 else 0.77) },
      "all failed" -> names.map(_ -> -1.0))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    for ((label, results) <- profiles) {
      val line = Bench.renderFitting(results, "sf0.1",
        repeats = 4, contended = true, loadStart = 12.34, loadEnd = 23.45)
      assert(line.length < 2000,
        s"'$label' renders ${line.length} chars for ${names.size} queries — " +
          "the driver tail-captures 2000; shorten keys or values")
      // whatever the degradation level — including the shed floor —
      // the line stays valid JSON with the envelope the driver parses,
      // and a partial query map always declares itself via "drop"
      val tree = mapper.readTree(line)
      assert(tree.get("metric").asText() == "total" && tree.get("failed") != null)
      val qn = tree.get("queries").size()
      if (qn < names.size)
        assert(tree.get("drop").asInt() == names.size - qn,
          s"'$label': partial map ($qn of ${names.size}) must declare its drop count")
      val expectedFailed = results.count(_._2 < 0)
      assert(tree.get("failed").asInt() == expectedFailed,
        s"'$label': failed count must cover every query, shed or not")
    }
    // at 100 registry keys the key set ALONE (~1930 chars) has
    // outgrown the 2000-char window even at 1-char values, so every
    // profile may shed — but realistic shapes must shed only a few
    // FASTEST entries (the least total-time signal per character),
    // always declared via "drop", with target/bench.json keeping the
    // full map at 4 decimals (the level -1 rendering, budget-free)
    for (label <- Seq("all sub-second", "realistic contended")) {
      val line = Bench.renderFitting(profiles.toMap.apply(label), "sf0.1",
        repeats = 4, contended = true, loadStart = 12.34, loadEnd = 23.45)
      val kept = mapper.readTree(line).get("queries").size()
      assert(kept >= names.size - 5,
        s"'$label' must shed at most a handful of entries, kept $kept of ${names.size}")
    }
    val full = Bench.renderLine(profiles.toMap.apply("all sub-second"), "sf0.1",
      repeats = 4, contended = true, loadStart = 12.34, loadEnd = 23.45, level = -1)
    assert(mapper.readTree(full).get("queries").size() == names.size,
      "the file-copy rendering must always carry every entry")
    // idle-shaped runs (many fast entries, modest tail): renderFitting
    // must pick the finest UNIFORM level that fits the budget, or the
    // per-entry adaptive rendering when none does — asserted against
    // that derived choice rather than a hard-coded level, so the test
    // tracks the registry's size instead of breaking when queries are
    // added or removed. Either way the idle line must keep decimals:
    // the everywhere-integer floor erases the per-query signal.
    val idle = names.zipWithIndex.map { case (n, i) => n -> (if (i % 6 == 0) 1.43 else 0.31) }
    val idleLine = Bench.renderFitting(idle, "sf0.1",
      repeats = 4, contended = false, loadStart = 0.5, loadEnd = 0.6)
    assert(idleLine.length < 2000, "idle line must fit the tail window")
    val expected = (0 to 2).map(l =>
        Bench.renderLine(idle, "sf0.1", 4, false, 0.5, 0.6, level = l))
      .find(_.length <= 1990)
      .getOrElse(Bench.renderAdaptive(idle, "sf0.1", 4, false, 0.5, 0.6, 1990))
    assert(idleLine == expected,
      "renderFitting must choose the finest uniform level that fits, else the adaptive rendering")
    assert(idleLine != Bench.renderLine(idle, "sf0.1", 4, false, 0.5, 0.6, level = 3),
      "an idle-shaped run must never degrade to the everywhere-integer floor — " +
        "sub-second entries (most of the registry) must keep a decimal")
    assert(idleLine.contains("0.3"),
      "the idle line must carry sub-second decimals, uniform or adaptive")
  }

  test("past level 2 the degradation is per-entry: the hottest sub-second entries keep decimals") {
    // the adaptive regime between uniform level 2 and the shed floor,
    // tested at a DERIVED budget (the all-integer floor's length plus
    // a partial upgrade allowance) so the test tracks registry growth
    // instead of hunting for an overflow point that may now land in
    // the shed regime. values: a 1.43 s band (integers at level 2
    // regardless), a warm 0.77 band, a 0.31 noise floor
    def valueOf(i: Int) = if (i % 6 == 0) 1.43 else if (i % 6 == 1) 0.77 else 0.31
    val results = names.zipWithIndex.map { case (n, i) => n -> valueOf(i) }
    val floorLen = Bench.renderLine(results, "sf0.1", 2, false, 0.5, 0.6, level = 3).length
    // each upgraded sub-second entry costs +2 chars ("0.8" vs "1"):
    // this budget admits ~20 upgrades, far fewer than the sub-second
    // population — squarely the partial-upgrade regime
    val budget = floorLen + 40
    val line = Bench.renderAdaptive(results, "sf0.1",
      repeats = 2, contended = false, loadStart = 0.5, loadEnd = 0.6, budget = budget)
    assert(line.length <= budget, s"adaptive line must fit, got ${line.length} for $budget")
    // valid JSON end to end (the driver json.loads this line)
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    val qs = tree.get("queries")
    assert(qs.size() == results.size)
    val rendered = results.map { case (n, v) => (v, qs.get(n).asText()) }
    // every entry is its level-2 or level-3 form, nothing else
    rendered.foreach {
      case (1.43, s) => assert(s == "1")
      case (0.77, s) => assert(s == "0.8" || s == "1")
      case (0.31, s) => assert(s == "0.3" || s == "0")
      case other     => fail(s"unexpected $other")
    }
    // prefix property: decimals go to the hottest sub-second entries
    // first — a cold entry may only keep its decimal if every warmer
    // one did
    if (rendered.exists { case (v, s) => v == 0.31 && s == "0.3" })
      assert(rendered.forall { case (v, s) => v != 0.77 || s == "0.8" },
        "no 0.31 entry may out-rank a 0.77 entry for the decimal budget")
    // the adaptive regime actually upgraded something (the budget gap
    // between level 3 and the overflow line is real)
    assert(rendered.exists { case (v, s) => v == 0.77 && s == "0.8" },
      "at least the hottest sub-second entries must keep their decimal")
    // determinism: same inputs, same line
    assert(line == Bench.renderAdaptive(results, "sf0.1", 2, false, 0.5, 0.6, budget))
  }

  test("envelope re-measurement: outliers get fresh samples, recovered mins win, " +
      "real regressions survive, failures are left alone") {
    val envelope = Map("a" -> 0.5, "b" -> 0.5, "c" -> 0.5, "d" -> 0.5)
    // a: inflated by a spike, recovers on re-measure; b: real 4×
    // regression, re-measures never help; c: inside 2×, untouched;
    // d: failed, must not be re-measured; e: no envelope entry
    val results = Seq("a" -> 2.0, "b" -> 2.0, "c" -> 0.9, "d" -> -1.0, "e" -> 3.0)
    var sampled = List.empty[String]
    val (out, re) = Bench.remeasureOutliers(results, envelope, extraRepeats = 3) {
      name => sampled ::= name; if (name == "a") 0.4 else 2.1
    }
    val m = out.toMap
    assert(m("a") == 0.4, "spike victim must recover to the fresh min")
    assert(m("b") == 2.0, "a real regression keeps its (better) min and stays >2x")
    assert(m("c") == 0.9 && m("d") == -1.0 && m("e") == 3.0)
    assert(!sampled.contains("c") && !sampled.contains("d") && !sampled.contains("e"),
      "only envelope outliers may be re-sampled")
    // a recovered in round 1; b stayed an outlier and got round 2 too
    assert(sampled.count(_ == "a") == 3 && sampled.count(_ == "b") == 6)
    assert(re == 3, s"re counts re-measurement runs (a once, b twice), got $re")
    // no envelope -> identity, zero cost
    val (same, zero) = Bench.remeasureOutliers(results, Map.empty, 3)(
      _ => fail("must not sample without an envelope"))
    assert(same == results && zero == 0)
    // all-failed fresh samples keep the original value
    val (kept, _) = Bench.remeasureOutliers(Seq("a" -> 2.0), envelope, 2)(_ => -1.0)
    assert(kept.toMap.apply("a") == 2.0)
  }

  test("the 're' count renders when nonzero, is omitted at zero, and survives degradation") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val small = Seq("q1" -> 0.5, "q2" -> 1.5)
    val withRe = Bench.renderLine(small, "sf0.1", 2, false, 0.5, 0.6, level = 0, re = 3)
    assert(mapper.readTree(withRe).get("re").asInt() == 3)
    val noRe = Bench.renderLine(small, "sf0.1", 2, false, 0.5, 0.6, level = 0)
    assert(!noRe.contains("\"re\""))
    // at the budget-constrained levels the count still renders — a
    // reader must know the mins were defended
    val big = names.map(_ -> 0.99)
    val line = Bench.renderFitting(big, "sf0.1", 4, true, 12.3, 23.4, re = 2)
    assert(line.length < 2000 && mapper.readTree(line).get("re").asInt() == 2)
  }

  test("'pre' (the pre-defense total) rides along with 're': both estimators visible, " +
      "omitted when the defense never fired or no pre was given") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val small = Seq("q1" -> 0.5, "q2" -> 1.5)
    // defended run: the one-sided min-only defense makes `value` a
    // lower-biased estimator, so the undefended total must be
    // reported beside it for like-for-like comparisons across runs
    val defended = Bench.renderLine(small, "sf0.1", 2, false, 0.5, 0.6,
      level = 0, re = 3, pre = 2.75)
    val tree = mapper.readTree(defended)
    // pre is formatted by the same ms() as value: 2.75 -> 2.8 at level 0
    assert(tree.get("re").asInt() == 3 && tree.get("pre").asDouble() == 2.8)
    // pre without re would be redundant (value == pre): omitted
    val undefended = Bench.renderLine(small, "sf0.1", 2, false, 0.5, 0.6,
      level = 0, re = 0, pre = 2.75)
    assert(!undefended.contains("\"pre\""))
    // and it survives the budget-constrained degradation path
    val big = names.map(_ -> 0.99)
    val line = Bench.renderFitting(big, "sf0.1", 4, true, 12.3, 23.4,
      re = 2, pre = 99.123)
    assert(line.length < 2000 && mapper.readTree(line).get("pre").asDouble() > 0)
  }

  test("loadEnvelope: tier-matched file loads, mismatched tier is ignored") {
    // the repo's recorded envelope is sf0.1 — it must load there and
    // refuse everywhere else (sf0.001 has no recorded envelope)
    val env = Bench.loadEnvelope("sf0.1")
    assert(env.size == names.size || env.nonEmpty,
      s"recorded envelope must cover the registry, got ${env.size}")
    assert(env.values.forall(_ > 0))
    assert(Bench.loadEnvelope("sf0.002").isEmpty)
    // the sf1 tier record doubles as that tier's envelope
    assert(Bench.loadEnvelope("sf1").nonEmpty)
  }

  test("ms formatting stays compact and driver-parseable at every level") {
    assert(Bench.ms(-1.0) == "-1")
    assert(Bench.ms(0.0) == "0")
    assert(Bench.ms(0.334) == "0.33")   // fine: 2 decimals under 1 s
    assert(Bench.ms(1.234) == "1.2")    // fine: 1 decimal from 1 s
    assert(Bench.ms(9.94) == "9.9")
    assert(Bench.ms(9.96) == "10")      // rounds up across the 10 s knee
    assert(Bench.ms(42.14) == "42")     // whole seconds past 10 s
    assert(Bench.ms(177.7) == "178")
    assert(Bench.ms(0.004) == "0")      // strips to the shortest form
    assert(Bench.ms(0.77, level = 1) == "0.8")  // coarse caps at 3 chars
    assert(Bench.ms(0.77, level = 2) == "0.8")  // sub-second keeps a decimal
    assert(Bench.ms(1.43, level = 2) == "1")    // 1 s+ rounds to integer
    assert(Bench.ms(9.96, level = 2) == "10")
    assert(Bench.ms(0.77, level = 3) == "1")    // everywhere-integer floor
    assert(Bench.ms(42.14, level = 3) == "42")
    assert(Bench.ms(-1.0, level = 3) == "-1")
    // level -1: the file copy's fidelity — no budget, 4 decimals
    assert(Bench.ms(1.23456, level = -1) == "1.2346")
    assert(Bench.ms(42.14, level = -1) == "42.14")
    assert(Bench.ms(0.5, level = -1) == "0.5")
  }
}
