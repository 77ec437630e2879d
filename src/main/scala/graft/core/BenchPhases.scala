package graft.core

/** Phase clock for the storage-flavored bench keys (VERDICT r16
  * "wrong" #3): gate queries that SEED temp tables before exercising
  * their operator mark the seeding with [[setup]]; Bench subtracts the
  * accumulated setup time per run and reports `{setup, measured}`
  * under separate JSON keys, so a BENCH_rN delta on q60/q61/d39/s18/
  * s19/q63/s20 tracks the OPERATOR, not the fixture insert in front of
  * it. Zero-cost when nothing marks (ordinary queries never touch it);
  * accumulator semantics, so setup blocks may appear anywhere in the
  * gate — including mid-protocol (s19's staged second insert). */
object BenchPhases {
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)

  def reset(): Unit = acc.set(0L)

  /** Accumulated setup seconds since the last [[reset]]. */
  def setupSec: Double = acc.get / 1e9

  /** Run `f`, attributing its wall time to SETUP. */
  def setup[A](f: => A): A = {
    val t0 = System.nanoTime()
    try f finally acc.addAndGet(System.nanoTime() - t0)
  }
}
