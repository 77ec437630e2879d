package graft.core

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSuite

/** The r17 writer-LOCK lease protocol (VERDICT r16 "What's wrong" #1):
  * holder UUID in the LOCK file, heartbeat every lease/3, stale
  * takeover via rename-CAS, poisoned handle on lease loss. */
class LeaseLockSpec extends SparkSuite {

  private def cfg(dir: String, leaseMs: Long = 60000L) =
    ChronoConfig(dir, bucket = "day", sketchLgK = 0, sketchCmsDepth = 0,
      sketchBloomKeys = 0, writersPerBucket = 1, lockLeaseMs = leaseMs)

  test("two handles racing on one root: the loser is refused while the lease is fresh") {
    val dir = Files.createTempDirectory("lease1").toString
    val db1 = new ChronoDB(spark, cfg(dir))
    try {
      val e = intercept[DatabaseLockedException](new ChronoDB(spark, cfg(dir)))
      assert(e.getMessage.contains("held by"))
      // the losing open must not have damaged the winner's lock
      db1.createTable("t")
      db1.insertSeq("t", Seq(ChronoRow("a",
        Timestamp.valueOf("2024-01-01 10:00:00"), Array[Byte](1))))
      assert(db1.table("t").count() === 1L)
    } finally db1.close()
    // released: a fresh open succeeds
    new ChronoDB(spark, cfg(dir)).close()
  }

  test("a stale lease (crashed holder) is taken over; the old uuid is reported") {
    val dir = Files.createTempDirectory("lease2").toString
    // simulate a crashed holder: LOCK with a foreign uuid and an OLD
    // heartbeat (mtime aged past the lease)
    val lock = Paths.get(dir, "LOCK")
    Files.writeString(lock, "dead-beef-uuid")
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    val db = new ChronoDB(spark, cfg(dir, leaseMs = 1000))
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(ChronoRow("a",
        Timestamp.valueOf("2024-01-01 10:00:00"), Array[Byte](1))))
      assert(db.table("t").count() === 1L)
      // the stale-aside file was cleaned up
      assert(!Files.exists(Paths.get(dir).resolve("LOCK.stale")) &&
        Files.list(Paths.get(dir)).toArray.map(_.toString)
          .count(_.contains("LOCK.stale")) === 0)
    } finally db.close()
  }

  test("heartbeats keep a long-lived handle's lease fresh past the lease window") {
    val dir = Files.createTempDirectory("lease3").toString
    val db1 = new ChronoDB(spark, cfg(dir, leaseMs = 600))
    try {
      Thread.sleep(1500) // several lease windows; heartbeats must renew
      intercept[DatabaseLockedException](
        new ChronoDB(spark, cfg(dir, leaseMs = 600)))
    } finally db1.close()
  }

  test("a holder whose lease was stolen is poisoned: verbs fail loudly, close leaves the thief's lock") {
    val dir = Files.createTempDirectory("lease4").toString
    val db1 = new ChronoDB(spark, cfg(dir, leaseMs = 600))
    db1.createTable("t")
    // simulate a thief (partition/GC scenario): replace the lock content
    // through the Hadoop FS (keeps the .crc sidecar consistent)
    val (cfs, root) = ChronoFs.resolve(dir, spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(root, "LOCK")
    val out = cfs.fs.create(lock, true)
    out.write("thief-uuid".getBytes("UTF-8")); out.close()
    // db1's next heartbeat (≤200ms) discovers the loss and poisons
    Thread.sleep(800)
    val e = intercept[DatabaseLockedException](db1.createTable("t2"))
    assert(e.getMessage.contains("thief-uuid"))
    db1.close()
    // close() must NOT delete the thief's lock
    assert(cfs.readLines(lock).head === "thief-uuid")
    cfs.deleteIfExists(lock)
  }
}
