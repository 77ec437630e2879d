package graft.core

import java.sql.Timestamp
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

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

  /** Start a ticker (reference merge_interval/maintenance_interval). */
  def start(intervalSeconds: Long): Unit = synchronized {
    if (exec.isDefined) return
    val e = Executors.newSingleThreadScheduledExecutor(r => {
      val th = new Thread(r, "graft-maintenance"); th.setDaemon(true); th
    })
    e.scheduleWithFixedDelay(() => {
      try tick() catch { case _: Throwable => () }
    }, intervalSeconds, intervalSeconds, TimeUnit.SECONDS)
    exec = Some(e)
  }

  def stop(): Unit = synchronized {
    exec.foreach(_.shutdownNow())
    exec = None
  }
}
