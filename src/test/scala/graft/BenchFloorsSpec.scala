package graft

import org.scalatest.funsuite.AnyFunSuite

/** The host-normalized floor check, per-pass since r15 (VERDICT r14 #3):
  * replaying the r11 driver numbers (six false breaches from a host at
  * ~1.6× on identical code) AND the r14 storm (q68_stream's every run
  * inside a multi-minute stall that q01's best escaped) must yield ZERO
  * breaches, while a genuine single-lane 2× regression on a quiet host
  * still trips. Pure arithmetic, no Spark. */
class BenchFloorsSpec extends AnyFunSuite {

  private val floors = Map(
    "q167_ngram_lm" -> 3.31, "q169_ccnet_curation" -> 5.42,
    "q68_stream" -> 3.50,
    "qW_hilbert_write" -> 1.31, "qW_windowed_write" -> 4.23,
    "qW_append_compact" -> 2.27, "qW_mv_merge" -> 2.99,
    "q01_pricing_summary" -> 0.6)
  private val canary = Some(("q01_pricing_summary", 0.27))

  test("the r11 driver artifact (uniform ~1.6× host) replays with zero " +
      "breaches") {
    // BENCH_r11 bests as single-run passes: every lane inflated together
    val r11 = Map(
      "q01_pricing_summary" -> Seq(0.442),
      "q167_ngram_lm" -> Seq(4.819), "q169_ccnet_curation" -> Seq(6.564),
      "qW_hilbert_write" -> Seq(1.421), "qW_windowed_write" -> Seq(4.360),
      "qW_append_compact" -> Seq(2.840), "qW_mv_merge" -> Seq(3.776))
    val (factors, breaches) = Bench.floorBreachesPerPass(r11, floors, canary)
    assert(factors.size == 1 && factors.head > 1.5 && factors.head < 1.8)
    assert(breaches.isEmpty, s"uniform host load must not page: $breaches")
  }

  test("the r14 storm replays with zero breaches: a lane whose EVERY run " +
      "sat in the stall self-discounts via its own pass's canary") {
    // BENCH_r14's shape: q68_stream ran [5.3, 80, 55] — the old best-of
    // canary scaled every floor by one factor (1.16, q01's best run,
    // which fell OUTSIDE the storm) and billed the breach. Per-pass,
    // each run discounts by its own pass's weather: here the canary sat
    // in the storm with the lane (0.65/2.8/2.4 vs committed 0.34) and
    // the breach acquits arithmetically. When the storm dodges the
    // canary inside a pass (the literal r14 pass 1), this function still
    // pages — that residual case is what main()'s solo RETRY window
    // exists for.
    val storm = Map(
      "q01_pricing_summary" -> Seq(0.65, 2.80, 2.40), // canary in-storm too
      "q68_stream" -> Seq(5.32, 80.0, 54.9))
    val (factors, breaches) =
      Bench.floorBreachesPerPass(storm, floors, canary.map(_.copy(_2 = 0.34)))
    assert(factors.size == 3)
    // pass 1: 0.65/0.34 = 1.91 → 5.32/1.91 = 2.78 ≤ 3.50 — acquitted
    assert(breaches.isEmpty,
      s"a storm spanning a lane's whole window must not page: $breaches")
  }

  test("a genuine single-lane 2x regression on a quiet host still trips") {
    val quiet = Map(
      "q01_pricing_summary" -> Seq(0.27, 0.28, 0.27), // canary at committed
      "q167_ngram_lm" -> Seq(6.62, 6.70, 6.65), // 2× the floor, every pass
      "qW_mv_merge" -> Seq(2.3, 2.4, 2.3))
    val (factors, breaches) =
      Bench.floorBreachesPerPass(quiet, floors, canary)
    assert(factors.forall(f => f >= 1.0 && f < 1.05))
    assert(breaches.keySet == Set("q167_ngram_lm"))
  }

  test("a single-lane regression on a LOADED host trips past the scaled " +
      "ceiling") {
    val loaded = Map(
      "q01_pricing_summary" -> Seq(0.27 * 1.5), // host at 1.5×
      "q167_ngram_lm" -> Seq(3.0 * 3.31)) // 3× the floor > 1.5× weather
    val (factors, breaches) =
      Bench.floorBreachesPerPass(loaded, floors, canary)
    assert(factors == Seq(1.5))
    assert(breaches.keySet == Set("q167_ngram_lm"))
  }

  test("factors clamp per pass: never below 1 (fast host), capped at 3") {
    val fast = Map("q01_pricing_summary" -> Seq(0.10),
      "qW_mv_merge" -> Seq(2.5))
    assert(Bench.floorBreachesPerPass(fast, floors, canary)._1 == Seq(1.0))
    val melt = Map("q01_pricing_summary" -> Seq(27.0),
      "qW_mv_merge" -> Seq(2.5))
    assert(Bench.floorBreachesPerPass(melt, floors, canary)._1 == Seq(3.0))
    // the cap means a melted canary cannot hide an unbounded regression
    // (the canary lane itself pages too at 100× — the retry adjudicates)
    val hidden = Map("q01_pricing_summary" -> Seq(27.0),
      "q167_ngram_lm" -> Seq(40.0)) // 12× the floor vs 3× max discount
    assert(Bench.floorBreachesPerPass(hidden, floors, canary)
      ._2.keySet == Set("q167_ngram_lm", "q01_pricing_summary"))
  }

  test("no canary configured -> plain floors (the pre-r12 behavior)") {
    val (factors, breaches) = Bench.floorBreachesPerPass(
      Map("qW_mv_merge" -> Seq(3.5)), floors, None)
    assert(factors == Seq(1.0))
    assert(breaches.keySet == Set("qW_mv_merge"))
  }

  test("clamp saturation is flagged per pass (VERDICT r15 #6): a 3×-storm " +
      "pass reads clamped=true in the artifact, quiet passes false") {
    // BENCH_r15's literal pass_factors shape: [1.53, 1.30, 3.00] — the
    // third pass's canary ran ≥3× committed, so up to (ratio/3)× of real
    // regression could hide inside that pass's discount
    assert(Bench.clampSaturated(Seq(1.53, 1.30, 4.2)) ==
      Seq(false, false, true))
    assert(Bench.clampSaturated(Seq(3.0)) == Seq(true)) // exactly at cap
    assert(Bench.clampSaturated(Seq(0.9, 1.0)) == Seq(false, false))
    // failed-run placeholder slots carry no clamp evidence
    assert(Bench.clampSaturated(Seq(Double.NaN, 5.0)) == Seq(false, true))
    assert(Bench.clampSaturated(Nil) == Nil)
  }

  test("failed retry runs keep pass alignment (ADVICE r15): a NaN slot " +
      "neither discounts as weather nor counts as evidence") {
    // canary's pass-1 retry failed (NaN slot); the lane's pass-1 run must
    // pair with factor 1.0, NOT with pass 2's storm factor — under the
    // old compaction the lane's [in-storm, quiet] runs would shift left
    // and the quiet run would borrow the storm's 3× discount
    val runs = Map(
      "q01_pricing_summary" -> Seq(Double.NaN, 0.81), // pass 2 at 3×
      "q167_ngram_lm" -> Seq(6.62, 6.65)) // 2× the floor both passes
    val (factors, breaches) =
      Bench.floorBreachesPerPass(runs, floors, canary)
    assert(factors == Seq(1.0, 3.0))
    // pass-2's genuine 3× weather discounts 6.65 → 2.22 ≤ 3.31: acquitted
    // by ITS OWN pass — correct; but had the NaN compacted away, pass 1's
    // 6.62 would also have claimed the 3× discount
    assert(breaches.isEmpty)
    // a lane whose lone surviving run is quiet-pass still trips
    val runs2 = Map(
      "q01_pricing_summary" -> Seq(0.27, Double.NaN),
      "q167_ngram_lm" -> Seq(6.62, Double.NaN))
    val (f2, b2) = Bench.floorBreachesPerPass(runs2, floors, canary)
    assert(f2 == Seq(1.0, 1.0))
    assert(b2.keySet == Set("q167_ngram_lm"))
    // all-NaN lane: no evidence, no breach, no crash
    val runs3 = Map(
      "q01_pricing_summary" -> Seq(0.27),
      "q167_ngram_lm" -> Seq(Double.NaN))
    assert(Bench.floorBreachesPerPass(runs3, floors, canary)._2.isEmpty)
  }

  test("quiet-host canary alarm: fires only when EVERY pass is slow AND " +
      "the load is genuinely idle (r14 false-fired at load 0.108)") {
    // the r14 judge-host shape: ratio 1.633 at load/core 0.108 — loaded,
    // not quiet: must NOT fire
    assert(Bench.canaryBreach(Seq(1.633, 1.7, 1.65), 0.108).isEmpty)
    // genuinely idle close-out loads are 0.053-0.066: a consistently
    // slow canary there IS the engine
    assert(Bench.canaryBreach(Seq(1.633, 1.7, 1.65), 0.055).nonEmpty)
    // one slow pass among quiet ones is weather, not the engine
    assert(Bench.canaryBreach(Seq(1.1, 15.0, 1.2), 0.055).isEmpty)
    // empty ratios (no canary lane in the run) never alarm
    assert(Bench.canaryBreach(Nil, 0.01).isEmpty)
    // unknown load (-1) never alarms
    assert(Bench.canaryBreach(Seq(2.0, 2.0, 2.0), -1.0).isEmpty)
  }
}
