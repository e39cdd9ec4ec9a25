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
}
