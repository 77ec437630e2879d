package graft.core

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.TimeUnit

import scala.collection.mutable.ArrayBuffer

import graft.SparkSuite

/** The writer LOCK across a REAL process boundary (VERDICT r17 next
  * #3): [[LeaseLockSpec]] proves the lease protocol in-JVM with
  * simulated staleness; these tests spawn a second JVM
  * ([[LockContenderMain]], the full ChronoDB open path) and race it
  * against the suite's handle — mutual exclusion while held, handoff
  * after release, and stale takeover after a genuine unreleased crash
  * (`Runtime.halt`, the kill -9 shape). Reference intent:
  * fileutils.go:242-271's CreateLock, which the reference never wires
  * into Open and which leaks forever on crash. */
class CrossProcessLockSpec extends SparkSuite {

  private def cfg(dir: String, leaseMs: Long) =
    ChronoConfig(dir, bucket = "day", sketchLgK = 0, sketchCmsDepth = 0,
      sketchBloomKeys = 0, writersPerBucket = 1, lockLeaseMs = leaseMs)

  private def launch(args: String*): Process =
    LockContenderMain.launch(args: _*)

  /** Drain the contender's stdout until a line STARTS WITH one of the
    * tokens (returns that line) or the timeout lapses (fails). */
  private def awaitToken(p: Process, tokens: Seq[String],
      timeoutMs: Long = 120000L): String = {
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val deadline = System.currentTimeMillis() + timeoutMs
    val seen = ArrayBuffer.empty[String]
    while (System.currentTimeMillis() < deadline) {
      val line = r.readLine()
      if (line == null) {
        fail(s"contender exited without ${tokens.mkString("/")}; " +
          s"output:\n${seen.mkString("\n")}")
      }
      seen += line
      tokens.find(line.startsWith).foreach(_ => return line)
    }
    fail(s"timed out waiting for ${tokens.mkString("/")}; " +
      s"output:\n${seen.mkString("\n")}")
  }

  test("a second PROCESS is refused while this JVM holds the lease, and acquires after release") {
    val dir = Files.createTempDirectory("xlock1").toString
    val db = new ChronoDB(spark, cfg(dir, leaseMs = 60000L))
    try {
      val p = launch("open", dir, "60000")
      val line = awaitToken(p, Seq("REFUSED", "ACQUIRED"))
      p.waitFor(60, TimeUnit.SECONDS)
      assert(line.startsWith("REFUSED"), line)
      assert(line.contains("held by"), line)
      // the refused open must not have damaged the holder's lock
      db.createTable("t")
      db.insertSeq("t", Seq(ChronoRow("a",
        Timestamp.valueOf("2024-01-01 10:00:00"), Array[Byte](1))))
      assert(db.table("t").count() === 1L)
    } finally db.close()
    // after release, a fresh process acquires and releases cleanly
    val p2 = launch("open", dir, "60000")
    assert(awaitToken(p2, Seq("REFUSED", "ACQUIRED")).startsWith("ACQUIRED"))
    assert(awaitToken(p2, Seq("RELEASED")).startsWith("RELEASED"))
    p2.waitFor(60, TimeUnit.SECONDS)
  }

  test("a holder process that dies WITHOUT releasing is taken over once its lease ages out") {
    val dir = Files.createTempDirectory("xlock2").toString
    val p = launch("crash", dir, "60000")
    assert(awaitToken(p, Seq("ACQUIRED")).startsWith("ACQUIRED"))
    assert(p.waitFor(60, TimeUnit.SECONDS), "contender did not halt")
    // the LOCK file survives the crash (no release ran)
    assert(Files.exists(java.nio.file.Paths.get(dir, "LOCK")))
    // while the dead holder's lease is still fresh, an opener is refused
    intercept[DatabaseLockedException](
      new ChronoDB(spark, cfg(dir, leaseMs = 60000L)))
    // once heartbeats stop long enough (short-lease opener), takeover
    Thread.sleep(1500)
    val db = new ChronoDB(spark, cfg(dir, leaseMs = 1000L))
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(ChronoRow("a",
        Timestamp.valueOf("2024-01-01 10:00:00"), Array[Byte](1))))
      assert(db.table("t").count() === 1L)
    } finally db.close()
  }
}
