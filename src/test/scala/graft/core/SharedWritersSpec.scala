package graft.core

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** SHARED WRITERS (`lockMode = "verb"`): several handles — and, in
  * CrossProcessLockSpec's sibling test, several PROCESSES — interleave
  * writes on one root, each mutating verb acquiring the lease for the
  * commit and releasing it after (the Delta/Iceberg multi-writer
  * posture at verb granularity). Every commit stays serialized: the
  * manifest fold, sidecar observes, and the `_history` log see one
  * writer at a time, so versions remain DENSE and linear whatever the
  * interleave. Reads never lock in either mode. */
class SharedWritersSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def cfg(dir: String) = ChronoConfig(dir, bucket = "day",
    sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
    writersPerBucket = 1, lockMode = "verb", lockWaitMs = 120000L)

  test("two verb-mode handles interleave verbs on one root; history stays dense and sidecars consistent") {
    val dir = Files.createTempDirectory("shared1").toString
    val h1 = new ChronoDB(spark, cfg(dir))
    val h2 = new ChronoDB(spark, cfg(dir))
    try {
      h1.createTable("t")
      h1.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1)),
        ChronoRow("b", ts("2024-03-02 10:00:00"), Array(2))))   // v1
      h2.insertSeq("t", Seq(
        ChronoRow("c", ts("2024-03-03 10:00:00"), Array(3))))   // v2
      assert(h2.deleteKeys("t", Seq("a")) === 1L)               // v3
      h1.insertSeq("t", Seq(
        ChronoRow("d", ts("2024-03-04 10:00:00"), Array(4))))   // v4
      // both handles read the same converged state
      assert(h1.table("t").select(col("key")).collect()
        .map(_.getString(0)).toSet === Set("b", "c", "d"))
      assert(h2.table("t").count() === 3L)
      // versions dense, one per verb, whoever ran it
      val versions = h1.history("t").map(_.version).sorted
      assert(versions === Seq(0L, 1L, 2L, 3L, 4L))
      assert(h1.manifestConsistent("t"))
      assert(h1.sidecarsConsistent("t"))
    } finally { h1.close(); h2.close() }
  }

  test("concurrent THREADED writers across two handles: exact row total, dense history, consistent manifest") {
    val dir = Files.createTempDirectory("shared2").toString
    val h1 = new ChronoDB(spark, cfg(dir))
    val h2 = new ChronoDB(spark, cfg(dir))
    try {
      h1.createTable("t")
      val pool = Executors.newFixedThreadPool(4)
      val perWriter = 5
      val tasks = (0 until 4).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val h = if (w % 2 == 0) h1 else h2
            (1 to perWriter).foreach { i =>
              h.insertSeq("t", Seq(ChronoRow(s"w${w}_$i",
                ts("2024-03-01 10:00:00"), Array((i % 127).toByte))))
            }
          }
        })
      }
      tasks.foreach(_.get(300, TimeUnit.SECONDS))
      pool.shutdown()
      assert(h1.table("t").count() === (4 * perWriter).toLong)
      // one commit per insert, versions dense — no lost or duplicated
      // commits under the race
      val versions = h1.history("t").map(_.version).sorted
      assert(versions === (0L to (4 * perWriter).toLong))
      assert(h1.manifestConsistent("t"))
    } finally { h1.close(); h2.close() }
  }

  test("a handle-mode holder excludes verb-mode writers: the verb times out loudly, nothing is damaged") {
    val dir = Files.createTempDirectory("shared3").toString
    val exclusive = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      writersPerBucket = 1))
    try {
      exclusive.createTable("t")
      val shared = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
        sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
        writersPerBucket = 1, lockMode = "verb", lockWaitMs = 300L))
      try {
        val e = intercept[DatabaseLockedException] {
          shared.insertSeq("t", Seq(
            ChronoRow("x", ts("2024-03-01 10:00:00"), Array(1))))
        }
        assert(e.getMessage.contains("timed out"))
      } finally shared.close()
      // the exclusive holder is unharmed
      exclusive.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1))))
      assert(exclusive.table("t").count() === 1L)
    } finally exclusive.close()
  }

  test("two PROCESSES + this JVM interleave shared-writer inserts: exact total, dense history") {
    val dir = Files.createTempDirectory("shared4").toString
    val mine = new ChronoDB(spark, cfg(dir))
    try {
      mine.createTable("t")
      def launch(prefix: String, k: Int): Process =
        LockContenderMain.launch("shared", dir, "60000", prefix, k.toString)
      val p1 = launch("p1_", 6)
      val p2 = launch("p2_", 6)
      // race our own writer against both processes
      (1 to 6).foreach { i =>
        mine.insertSeq("t", Seq(ChronoRow(s"me_$i",
          ts("2024-03-01 10:00:00"), Array((i % 127).toByte))))
      }
      def drainDone(p: Process): Unit = {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream))
        var line = r.readLine()
        val seen = scala.collection.mutable.ArrayBuffer.empty[String]
        while (line != null && !line.startsWith("DONE")) {
          seen += line; line = r.readLine()
        }
        assert(line != null,
          s"contender died before DONE:\n${seen.takeRight(25).mkString("\n")}")
      }
      drainDone(p1); drainDone(p2)
      p1.waitFor(60, TimeUnit.SECONDS); p2.waitFor(60, TimeUnit.SECONDS)
      assert(mine.table("t").count() === 18L)
      val versions = mine.history("t").map(_.version).sorted
      assert(versions === (0L to 18L))
      assert(mine.manifestConsistent("t"))
      // every writer's keys all landed
      val keys = mine.table("t").select(col("key")).collect()
        .map(_.getString(0)).toSet
      assert(Seq("p1_", "p2_", "me_").forall(p =>
        (1 to 6).forall(i => keys(s"$p$i"))))
    } finally mine.close()
  }

  test("close() while a sibling thread's verb is mid-commit leaves the lease to the verb's own release (ADVICE r18)") {
    val dir = Files.createTempDirectory("shared5").toString
    val db = new ChronoDB(spark, cfg(dir))
    db.createTable("t")
    val lock = java.nio.file.Paths.get(dir, "LOCK")
    val entered = new java.util.concurrent.CountDownLatch(1)
    val proceed = new java.util.concurrent.CountDownLatch(1)
    @volatile var verbFailed: Throwable = null
    val verb = new Thread(() => {
      try db.withVerbLock { entered.countDown(); proceed.await() }
      catch { case t: Throwable => verbFailed = t; entered.countDown() }
    }, "mid-commit-verb")
    verb.start()
    entered.await()
    assert(verbFailed == null)
    assert(java.nio.file.Files.exists(lock), "verb holds the lease")
    // close from ANOTHER thread while the verb is in flight: the old
    // shape deleted the LOCK here (uuid matches), handing the lease to
    // a foreign process mid-commit
    db.close()
    assert(java.nio.file.Files.exists(lock),
      "close() must not delete the LOCK while a sibling verb is mid-commit")
    proceed.countDown()
    verb.join(30000)
    assert(!verb.isAlive)
    // the verb's own release path deleted it once the commit finished
    assert(!java.nio.file.Files.exists(lock),
      "the in-flight verb's release still deletes the LOCK after close()")
  }
}
