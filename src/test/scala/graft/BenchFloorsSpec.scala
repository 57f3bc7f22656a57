package graft

import org.scalatest.funsuite.AnyFunSuite

/** The host-normalized floor check (VERDICT r11 #5): replaying the r11
  * DRIVER numbers — six false breaches from a host running at ~1.6× the
  * committed close-out on identical code — must yield ZERO breaches,
  * while a genuine single-lane 2× regression on a quiet host still
  * trips. Pure arithmetic, no Spark. */
class BenchFloorsSpec extends AnyFunSuite {

  // the committed r11 floors for the six lanes the driver breached
  private val floors = Map(
    "q167_ngram_lm" -> 3.31, "q169_ccnet_curation" -> 5.42,
    "qW_hilbert_write" -> 1.31, "qW_windowed_write" -> 4.23,
    "qW_append_compact" -> 2.27, "qW_mv_merge" -> 2.99,
    "q01_pricing_summary" -> 0.6)
  private val canary = Some(("q01_pricing_summary", 0.27))

  test("the r11 driver artifact replays with zero breaches") {
    // BENCH_r11.json bests on the loaded driver host (q01 from VERDICT:
    // 0.442 vs the 0.27 quiet-host seed -> hostFactor ~1.64)
    val r11 = Map(
      "q01_pricing_summary" -> 0.442,
      "q167_ngram_lm" -> 4.819, "q169_ccnet_curation" -> 6.564,
      "qW_hilbert_write" -> 1.421, "qW_windowed_write" -> 4.360,
      "qW_append_compact" -> 2.840, "qW_mv_merge" -> 3.776)
    val (hf, breaches) = Bench.floorBreaches(r11, floors, canary)
    assert(hf > 1.5 && hf < 1.8, s"hostFactor $hf")
    assert(breaches.isEmpty,
      s"uniform host load must not page: $breaches")
  }

  test("a genuine single-lane 2x regression on a quiet host still trips") {
    val quiet = Map(
      "q01_pricing_summary" -> 0.27, // canary at its committed best
      "q167_ngram_lm" -> 2.0 * 3.31, // the regression
      "qW_mv_merge" -> 2.3)
    val (hf, breaches) = Bench.floorBreaches(quiet, floors, canary)
    assert(hf == 1.0)
    assert(breaches.keySet == Set("q167_ngram_lm"))
  }

  test("a single-lane regression on a LOADED host trips past the scaled " +
      "ceiling") {
    val loaded = Map(
      "q01_pricing_summary" -> 0.27 * 1.5, // host at 1.5x
      "q167_ngram_lm" -> 3.0 * 3.31) // 3x the floor > 1.5x headroom
    val (hf, breaches) = Bench.floorBreaches(loaded, floors, canary)
    assert(hf == 1.5)
    assert(breaches.keySet == Set("q167_ngram_lm"))
  }

  test("hostFactor clamps: never below 1 (fast host), capped at 3") {
    val fast = Map("q01_pricing_summary" -> 0.10, "qW_mv_merge" -> 2.5)
    assert(Bench.floorBreaches(fast, floors, canary)._1 == 1.0)
    val melt = Map("q01_pricing_summary" -> 27.0, "qW_mv_merge" -> 2.5)
    assert(Bench.floorBreaches(melt, floors, canary)._1 == 3.0)
  }

  test("no canary configured -> plain floors (the pre-r12 behavior)") {
    val (hf, breaches) = Bench.floorBreaches(
      Map("qW_mv_merge" -> 3.5), floors, None)
    assert(hf == 1.0)
    assert(breaches.keySet == Set("qW_mv_merge"))
  }
}
