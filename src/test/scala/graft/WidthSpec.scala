package graft

import graft.operators.Dedup
import graft.api.GraftSession

/** Pins the shuffle-width derivations (r15 VERDICT #1 — the fan-out-aware
  * width that closed the PPJoin 1000× perf-weak mark). These are the pure
  * arithmetic twins of Dedup.sizedWidth / Dedup.fanOutWidth; the constants
  * encode the measured regimes from PERF.md:
  *  - small inputs: ~1 task / 256 KiB of input (scheduling-overhead floor,
  *    r9), clamped to the configured width;
  *  - explosion pipelines: width ∝ estimated SHUFFLE bytes (input × fanOut)
  *    at 128 MB/task, allowed above the configured width up to the
  *    fleet-aware cap (r14: 28 GB through 32 tasks spilled 27 GB; the
  *    manual 128 pin halved it — this derivation replaces the pin).
  */
class WidthSpec extends SparkSpecBase {

  test("sizedWidth: ~1 task per 256 KiB, clamped to configured width") {
    assert(Dedup.derivedSizedWidth(0L, 32) === 1)
    assert(Dedup.derivedSizedWidth(100L << 10, 32) === 1)
    assert(Dedup.derivedSizedWidth(600L << 10, 32) === 3)
    assert(Dedup.derivedSizedWidth(1L << 30, 32) === 32) // clamps
  }

  test("fanOutWidth: small inputs keep the sizedWidth floor (sf0.1 contract)") {
    // 0.6 MB of documents at fanOut 20 → 12 MB estimated shuffle → the
    // 128 MB/task term is 0; width = sizedWidth = 3, byte-identical plans
    assert(Dedup.derivedFanOutWidth(600L << 10, 20L, 32, 4096L) === 3)
    // 17.5 MB (the sf0.1 lineitem scale) still floors out at conf width
    assert(Dedup.derivedFanOutWidth(17L << 20, 20L, 32, 4096L) ===
      Dedup.derivedSizedWidth(17L << 20, 32))
  }

  test("fanOutWidth: the 1000x PPJoin cell derives >= the hand-tuned 128 pin") {
    // r14 measured: ~1.4 GB compressed input, shuffle ≈ 20× ≈ 28 GB;
    // 28 GB / 128 MB ≈ 218 ≥ the manual SPARK_GRAFT_SHUFFLE=128 that
    // halved spill — the derivation must land at least there, capped.
    val w = Dedup.derivedFanOutWidth(1400L << 20, 20L, 32, 4096L)
    assert(w >= 128 && w <= 4096)
    assert(w === (1400L << 20) * 20L / (128L << 20)) // = 218
  }

  test("fanOutWidth: capped by the fleet-aware widthCap") {
    assert(Dedup.derivedFanOutWidth(1L << 40, 20L, 32, 4096L) === 4096)
    // the cap grows with the executor fleet: 4 waves per core slot
    assert(GraftSession.widthCap(32) === 4096L)
    assert(GraftSession.widthCap(2048) === 8192L)
  }

  test("fanOutWidth: unknowable input bytes fall back to configured width") {
    import spark.implicits._
    // an in-memory frame has no input files — fanOutWidth must return the
    // session's configured shuffle width, not throw
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    assert(Dedup.fanOutWidth(df, 20L) ===
      spark.sessionState.conf.numShufflePartitions)
  }
}
