package graft

/** Advisory wall-clock gate for the streaming scale specs (round-12
  * ADVICE): a loaded or slow CI box can halve measured events/s without
  * any correctness regression, so throughput floors print a loud
  * advisory instead of failing the suite — the same philosophy as the
  * bench's contention sentinel, which records contention rather than
  * aborting. Set GRAFT_STRICT_PERF=1 to turn the floors back into hard
  * asserts (useful on a known-quiet box).
  */
object PerfGate {
  def check(rate: Double, floor: Double, what: String): Unit =
    if (rate <= floor) {
      val msg =
        f"$what: measured $rate%.1f events/s is below the $floor%.0f events/s advisory floor"
      if (sys.env.contains("GRAFT_STRICT_PERF"))
        throw new AssertionError(msg)
      else
        System.err.println(s"[perf-advisory] $msg (not asserted; box-load-sensitive)")
    }
}
