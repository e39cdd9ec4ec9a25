package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's contamination self-adjudication (pure logic — no Spark):
  * flagged spreads re-run with a bounded budget, clean spreads
  * untouched, unresolved flags stamped rather than silently carried. */
class BenchAdjudicationSpec extends AnyFunSuite {

  test("statsOf/ratioOf: median-min-max and the contamination signal") {
    assert(Bench.statsOf(Seq(3.0, 1.0, 2.0)) === ((2.0, 1.0, 3.0)))
    assert(Bench.statsOf(Nil) === ((-1.0, -1.0, -1.0)))
    assert(Bench.ratioOf(Seq(4.0, 1.0, 4.0)) === 4.0)
    assert(Bench.ratioOf(Nil) === 0.0)
  }

  test("a clean spread is never re-run") {
    var calls = 0
    val (samples, adj) = Bench.adjudicate(
      Map("q1" -> Vector(1.0, 1.1, 1.2)), 6,
      _ => { calls += 1; Some(1.0) })
    assert(calls === 0)
    assert(adj.isEmpty)
    assert(samples("q1") === Vector(1.0, 1.1, 1.2))
  }

  test("a contaminated spread is re-run until its merged median " +
    "stabilizes, and the adjudication records the retries") {
    // initial pool: min 1.0 with a 5× median — the host-steal shape
    val clean = Iterator(1.05, 1.1, 0.95, 1.0, 1.02, 0.98)
    var calls = 0
    val (samples, adj) = Bench.adjudicate(
      Map("q1" -> Vector(1.0, 5.0, 6.0)), 6,
      _ => { calls += 1; Some(clean.next()) })
    assert(calls > 0 && calls <= 6)
    val (med, mn, _) = Bench.statsOf(samples("q1"))
    assert(med / mn <= 2.0)
    val (extra, finalRatio) = adj("q1")
    assert(extra === calls)
    assert(finalRatio <= 2.0)
  }

  test("an unresolved flag exhausts the budget and is stamped with its " +
    "still-contaminated final ratio") {
    var calls = 0
    val (_, adj) = Bench.adjudicate(
      Map("q1" -> Vector(1.0, 5.0, 6.0)), 4,
      _ => { calls += 1; Some(7.0) }) // the steal never lets up
    assert(calls === 4)
    val (extra, finalRatio) = adj("q1")
    assert(extra === 4)
    assert(finalRatio > 2.0)
  }

  test("the GLOBAL retry budget caps total extra runs across flagged " +
    "queries; starved flags are stamped unresolved, not silently " +
    "untried") {
    var calls = 0
    val contaminated = Vector(1.0, 5.0, 6.0)
    val (_, adj) = Bench.adjudicate(
      Map("q1" -> contaminated, "q2" -> contaminated, "q3" -> contaminated),
      maxExtraRuns = 4,
      _ => { calls += 1; Some(7.0) }, // the steal never lets up
      globalBudget = 5)
    assert(calls === 5) // 4 on q1 + 1 on q2, then the budget is gone
    assert(adj.keySet === Set("q1", "q2", "q3"))
    assert(adj("q1")._1 === 4 && adj("q2")._1 === 1 && adj("q3")._1 === 0)
    // every flag is stamped with its (still contaminated) final ratio
    assert(adj.values.forall(_._2 > 2.0))
  }

  test("a rerun that throws (None) still consumes budget — no infinite " +
    "retry loop on a query that fails under re-run") {
    var calls = 0
    val (samples, adj) = Bench.adjudicate(
      Map("q1" -> Vector(1.0, 5.0, 6.0)), 3,
      _ => { calls += 1; None })
    assert(calls === 3)
    assert(samples("q1") === Vector(1.0, 5.0, 6.0))
    assert(adj("q1")._1 === 3)
  }

  // --- cross-run adjudication (vs the committed clean record) ------------

  /** Six steady queries at parity with the reference — the host-speed
    * control pool every cross-run case below shares. */
  private val steady: Map[String, Vector[Double]] =
    (1 to 6).map(i => s"s$i" -> Vector(1.0, 1.0, 1.0)).toMap
  private val steadyRef: Map[String, Double] =
    (1 to 6).map(i => s"s$i" -> 1.0).toMap

  test("parseRefMeds reads per-query medians out of a spread file and " +
    "ignores the adjudications map") {
    val text = """{"queries":{"q12":{"med":0.443,"min":0.41,"max":0.5},""" +
      """"q29":{"med":0.215,"min":0.2,"max":0.3}},"n":3,""" +
      """"adjudications":{"q12":{"extra_runs":4,"ratio":1.1}},"sf":"x"}"""
    assert(Bench.parseRefMeds(text) === Map("q12" -> 0.443, "q29" -> 0.215))
  }

  test("a uniformly-stolen window (med/min ~ 1, median several x the " +
    "clean record) self-corrects in the merged pool — the BENCH_r12 q12 " +
    "false-regression shape") {
    // within-run adjudication sees nothing: 6.9/6.8 ~ 1.0
    assert(Bench.ratioOf(Vector(6.93, 6.85, 6.97)) < 2.0)
    val clean = Iterator(0.44, 0.41, 0.47, 0.43, 0.45, 0.42)
    var calls = 0
    val (samples, flags, host) = Bench.adjudicateXrun(
      steady + ("q12" -> Vector(6.93, 6.85, 6.97)),
      steadyRef + ("q12" -> 0.44), 6,
      _ => { calls += 1; Some(clean.next()) })
    assert(host === 1.0)
    assert(calls > 0 && calls <= 6)
    val (before, extra, after) = flags("q12")
    assert(before > 10.0) // ~15.7x vs the clean record
    assert(extra === calls)
    assert(after <= 3.0) // back in band: the artifact self-corrected
    val (med, _, _) = Bench.statsOf(samples("q12"))
    assert(med < 1.0) // merged median is the clean value, not 6.9
  }

  test("a uniformly SLOWER host (every query inflated alike) flags " +
    "nothing — the median ratio is the control") {
    var calls = 0
    val (samples, flags, host) = Bench.adjudicateXrun(
      steady.view.mapValues(_.map(_ * 1.6)).toMap,
      steadyRef, 6, _ => { calls += 1; Some(1.6) })
    assert(calls === 0)
    assert(flags.isEmpty)
    assert(math.abs(host - 1.6) < 1e-9)
    assert(samples("s1") === Vector(1.6, 1.6, 1.6))
  }

  test("a genuine regression survives its re-runs and is stamped " +
    "unresolved (after > 3), never silently absorbed") {
    var calls = 0
    val (_, flags, _) = Bench.adjudicateXrun(
      steady + ("q9" -> Vector(5.0, 5.1, 4.9)),
      steadyRef + ("q9" -> 1.0), 4,
      _ => { calls += 1; Some(5.0) }) // the slowdown reproduces
    assert(calls === 4)
    val (before, extra, after) = flags("q9")
    assert(before > 3.0 && extra === 4 && after > 3.0)
  }

  test("queries absent from the reference are unjudgeable and left " +
    "alone; too few common queries disables the pass entirely") {
    var calls = 0
    val (_, flags, host) = Bench.adjudicateXrun(
      steady + ("q_new" -> Vector(9.0, 9.0, 9.0)),
      steadyRef, 6, _ => { calls += 1; Some(1.0) })
    assert(calls === 0 && flags.isEmpty && host === 1.0)
    val (_, f2, h2) = Bench.adjudicateXrun(
      Map("a" -> Vector(9.0), "b" -> Vector(9.0)),
      Map("a" -> 1.0, "b" -> 1.0), 6, _ => Some(1.0))
    assert(f2.isEmpty && h2 === 0.0)
  }

  test("sub-threshold absolute medians are never flagged — micro-query " +
    "jitter can be 5x without being worth a re-run") {
    val (_, flags, _) = Bench.adjudicateXrun(
      steady + ("q_tiny" -> Vector(0.2, 0.2, 0.2)),
      steadyRef + ("q_tiny" -> 0.04), 6,
      _ => fail("must not re-run a 0.2 s median"))
    assert(flags.isEmpty)
  }

  // --- driver-tail compact totals line (round 19) ---------------------
  // The driver keeps only the LAST 2000 chars of stdout and json-parses
  // whole lines. These tests pin the properties the fix depends on: the
  // line fits that window with EVERY declared query name in it at
  // realistic values, it degrades to deciseconds instead of overflowing
  // at pathological values, and it is strict JSON a line parser accepts.

  test("compactLine fits the driver's 2000-char tail window with all " +
    "declared query names at r18-shaped values") {
    // r18 shape: most queries sub-second, a 5.0 s worst case
    val vals = SparkEntry.queries.keys.zipWithIndex.map { case (k, i) =>
      k -> (if (i % 3 == 0) 3.662 else 0.877)
    }.toMap
    val line = Bench.compactLine(vals, 93.712, "/root/testdata/sf0.1", 4)
    assert(line.length <= 1995, s"line is ${line.length} chars")
    assert(line.contains("\"qunit\":\"cs\""))
  }

  test("compactLine degrades to a coarser unit rather than overflowing " +
    "when every query is pathologically slow") {
    // every query at 9.49 s: cs values are 3-digit (949) and the cs
    // line would be ~2040 chars; the ds rendering (2-digit values)
    // must win and fit
    val slow = SparkEntry.queries.keys.map(_ -> 9.49).toMap
    val ds = Bench.compactLine(slow, 806.65, "/root/testdata/sf0.1", 4)
    assert(ds.length <= 1995, s"line is ${ds.length} chars")
    assert(ds.contains("\"qunit\":\"ds\""))
    // every query at 99.99 s (a multi-hour bench): even whole seconds
    // cannot fit 85 names in the window — the coarsest rendering is
    // emitted as the least-truncated option, never a mid-scale one
    val worst = SparkEntry.queries.keys.map(_ -> 99.99).toMap
    val line = Bench.compactLine(worst, 8499.15, "/root/testdata/sf0.1", 4)
    assert(line.contains("\"qunit\":\"s\""))
    assert(line.length < Bench.compactLine(worst, 8499.15,
      "/root/testdata/sf0.1", 4, maxLen = 100000).length)
  }

  test("compactLine is one strict-JSON line with sorted keys, integer " +
    "centiseconds, a preserved -1 error sentinel and numeric sf") {
    val line = Bench.compactLine(
      Map("q2_b" -> 0.877, "q1_a" -> 3.6625, "q3_err" -> -1.0),
      4.539, "/root/testdata/sf0.1", 2)
    assert(!line.contains("\n"))
    assert(line ===
      """{"metric":"total","value":4.539,"unit":"sec","qunit":"cs",""" +
      """"queries":{"q1_a":366,"q2_b":88,"q3_err":-1},"sf":0.1,""" +
      """"flags":2}""")
    // non-numeric sf dir falls back to a quoted basename
    val s2 = Bench.compactLine(Map("q" -> 1.0), 1.0, "/tmp/custom", 0)
    assert(s2.contains(""""sf":"custom""""))
  }
}
