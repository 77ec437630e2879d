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
  private val phases = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  def reset(): Unit = { acc.set(0L); phases.clear() }

  /** Accumulated setup seconds since the last [[reset]]. */
  def setupSec: Double = acc.get / 1e9

  /** Run `f`, attributing its wall time to SETUP. */
  def setup[A](f: => A): A = {
    val t0 = System.nanoTime()
    try f finally acc.addAndGet(System.nanoTime() - t0)
  }

  /** Run `f`, attributing its wall time to a NAMED measured phase
    * (VERDICT r19 Next #6): multi-statement gates (q63's delete trio)
    * mark each statement so a BENCH_rN creep is attributable to the
    * statement that moved, in the artifact itself. Phases are a
    * decomposition of the measured time, not a new clock — Bench
    * reports them per query under `secondary_phases`. */
  def phase[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f finally phases.computeIfAbsent(name,
        _ => new java.util.concurrent.atomic.AtomicLong(0L))
      .addAndGet(System.nanoTime() - t0)
  }

  /** Named-phase seconds since the last [[reset]], insertion-ordered
    * deterministically by name. */
  def phaseSecs: Seq[(String, Double)] = {
    val it = phases.entrySet().iterator()
    val b = Seq.newBuilder[(String, Double)]
    while (it.hasNext) {
      val e = it.next(); b += e.getKey -> e.getValue.get / 1e9
    }
    b.result().sortBy(_._1)
  }
}
