package graft.stream

/** Sliding-window rate targeting — the reference's throttle semantics
  * (/root/reference/throttle/throttle.go: `Advice(add)` returns how long
  * to sleep so the windowed average rate meets `target`) re-expressed for
  * Spark's admission-control model, where a source does not SLEEP but
  * sizes the NEXT micro-batch.
  *
  * The math is the same ring of `numSamples` per-interval counts: the
  * windowed average `avg = sum(samples)/numSamples` is compared against
  * the per-interval target, and the imbalance becomes the correction.
  * Where the reference converts the overshoot into sleep time
  * (`interval - interval*target/avg`), [[admit]] converts it into the
  * row budget that keeps the window ON target:
  * `budget = target*numSamples - sum(window)` — the windowed total may
  * never exceed the target rate times the window length, so the average
  * is capped at `target`, a stream at/below target is never throttled
  * (the reference's zero-sleep property), and idle intervals earn a
  * proportional catch-up burst bounded by the window.
  *
  * Pure and clock-free: the caller reports elapsed intervals explicitly,
  * so behavior is deterministic under test and in checkpoint replay.
  */
final class RateAdvice(target: Long, numSamples: Int) {
  require(target > 0 && numSamples > 0)

  private val samples = new Array[Long](numSamples)
  private var sum = 0L
  private var hand = 0

  /** Record `add` rows consumed this interval, advance `ticks` intervals
    * (0 = same interval: accumulate only), and return the row budget for
    * the next batch.
    */
  def admit(add: Long, ticks: Int = 1): Long = {
    samples(hand) += add
    sum += add
    var t = 0
    while (t < ticks) {
      hand = (hand + 1) % numSamples
      sum -= samples(hand)
      samples(hand) = 0
      t += 1
    }
    math.max(0L, target * numSamples - sum)
  }

  /** Current windowed total (for assertions/metrics). */
  def windowSum: Long = sum
}
