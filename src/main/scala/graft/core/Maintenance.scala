package graft.core

import java.sql.Timestamp
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import scala.util.control.NonFatal

/** Background maintenance — the reference runs flush/merge/cleanup
  * goroutine tickers (ChronoBase db.go:195-249). Here flush is owned by
  * Structured Streaming (micro-batch commits), so the periodic work is
  * compaction + retention. `tick()` is the unit the scheduler calls;
  * [[start]] provides the reference's ticker behavior for embedded use.
  * On a real cluster these run as scheduled batch jobs instead. */
final class Maintenance(db: ChronoDB, tables: () => Seq[String]) {

  /** One maintenance pass over all tables: compact over-fragmented
    * buckets, drop expired buckets. Returns (compacted, droppedBuckets)
    * counts. */
  def tick(now: Timestamp = new Timestamp(System.currentTimeMillis())): (Int, Int) = {
    var compacted = 0
    var dropped = 0
    tables().foreach { t =>
      compacted += db.compact(t)
      dropped += db.cleanup(t, now).size
    }
    (compacted, dropped)
  }

  private var exec: Option[ScheduledExecutorService] = None

  private val failures = new AtomicInteger(0)
  @volatile private var lastFailure: Option[Throwable] = None

  /** Consecutive ticker failures since the last success — a permanently
    * failing loop is observable instead of silent. Reset to 0 by any
    * successful tick. */
  def consecutiveFailures: Int = failures.get()

  /** The throwable from the most recent failed tick, if the loop is
    * currently failing. */
  def lastError: Option[Throwable] = lastFailure

  /** One ticker iteration: a failing tick is logged and counted, a
    * successful one clears the streak. Only NonFatal errors are
    * swallowed — a fatal error (OOM, linkage) must kill the loop, not
    * be retried forever. */
  private[core] def safeTick(): Unit =
    try {
      tick()
      failures.set(0)
      lastFailure = None
    } catch {
      case NonFatal(e) =>
        val n = failures.incrementAndGet()
        lastFailure = Some(e)
        System.err.println(
          s"[graft-maintenance] tick failed ($n consecutive): $e")
    }

  /** Start a ticker (reference merge_interval/maintenance_interval). */
  def start(intervalSeconds: Long): Unit = synchronized {
    if (exec.isDefined) return
    val e = Executors.newSingleThreadScheduledExecutor(r => {
      val th = new Thread(r, "graft-maintenance"); th.setDaemon(true); th
    })
    e.scheduleWithFixedDelay(() => safeTick(), intervalSeconds,
      intervalSeconds, TimeUnit.SECONDS)
    exec = Some(e)
  }

  def stop(): Unit = synchronized {
    exec.foreach(_.shutdownNow())
    exec = None
  }
}
