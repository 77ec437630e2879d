package graft.core

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSuite

/** Reader snapshot grace for compact/cleanup (VERDICT r16 Missing #4):
  * with `trashGraceMs` set, superseded files stay IN PLACE (recorded in
  * the `_trash` log) so a reader that planned from the pre-rewrite
  * manifest still collects; vacuumOrphans purges entries once their
  * grace elapses; every listing-based consumer (rebuildManifest,
  * manifestConsistent, stats, compact victim counting) excludes the
  * retained files. */
class TrashGraceSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mk(graceMs: Long, ttl: Option[Long] = None): (ChronoDB, String) = {
    val dir = Files.createTempDirectory("grace").toString
    (new ChronoDB(spark, ChronoConfig(dir, bucket = "day", ttl = ttl,
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      writersPerBucket = 1, compactFileThreshold = 2,
      trashGraceMs = graceMs)), dir)
  }

  private def frag(db: ChronoDB, n: Int): Unit = (0 until n).foreach { i =>
    db.insertSeq("t", Seq(ChronoRow(s"k$i",
      ts(f"2024-03-01 1$i:00:00"), Array[Byte](i.toByte))))
  }

  private def diskFiles(dir: String): Seq[String] =
    graft.sources.ChronoLayout.listEntries(Paths.get(dir, "t")).map(_.file)

  test("grace compact: superseded files retained, pre-compact reader still collects, scans see the new layout") {
    val (db, dir) = mk(graceMs = 3600000) // 1h — never expires in-test
    try {
      db.createTable("t")
      frag(db, 4) // 4 files in one day bucket, threshold 2
      val preFiles = diskFiles(dir)
      assert(preFiles.size === 4)
      // a "reader" holding the pre-compact plan = the explicit old paths
      val oldPaths = preFiles.map(f => s"$dir/t/bucket=2024-03-01/$f")
      assert(db.compact("t") === 1)
      // old files are STILL on disk — the pre-compact reader collects
      assert(spark.read.parquet(oldPaths: _*).count() === 4L)
      // the manifest-planned scan sees only the compacted layout
      assert(db.table("t").count() === 4L)
      assert(db.stats("t").numFiles === 1L)
      assert(db.manifestConsistent("t"))
      assert(db.sidecarsConsistent("t"))
      // victim counting excludes trash: an immediate second compact no-ops
      assert(db.compact("t") === 0)
      // rebuildManifest during the grace must not resurrect
      db.rebuildManifest("t")
      assert(db.table("t").count() === 4L)
      assert(db.stats("t").numFiles === 1L)
      // vacuum BEFORE the grace elapses deletes nothing
      assert(db.vacuumOrphans("t") === 0)
      assert(diskFiles(dir).size === 5) // 4 retained + 1 compacted
    } finally db.close()
  }

  test("vacuum purges trash after the grace elapses; trash log drains") {
    val (db, dir) = mk(graceMs = 400)
    try {
      db.createTable("t")
      frag(db, 3)
      assert(db.compact("t") === 1)
      assert(diskFiles(dir).size === 4)
      Thread.sleep(600) // grace elapses
      assert(db.vacuumOrphans("t") === 3)
      assert(diskFiles(dir).size === 1)
      assert(!Files.exists(Paths.get(dir, "t", "_trash")))
      assert(db.table("t").count() === 3L)
      assert(db.manifestConsistent("t"))
    } finally db.close()
  }

  test("grace cleanup: expired bucket leaves the manifest now, disk after the grace; no re-count") {
    val (db, dir) = mk(graceMs = 400, ttl = Some(3600L)) // 1h TTL
    try {
      db.createTable("t")
      // insert each row while it is still inside TTL (the insert-time
      // TTL gate would drop an already-expired row silently)
      db.insertSeq("t", Seq(
        ChronoRow("old", ts("2024-03-01 10:00:00"), Array[Byte](1))),
        now = ts("2024-03-01 11:00:00"))
      db.insertSeq("t", Seq(
        ChronoRow("new", ts("2024-03-10 10:00:00"), Array[Byte](2))),
        now = ts("2024-03-10 11:00:00"))
      val preOld = s"$dir/t/bucket=2024-03-01"
      val oldFile = graft.sources.ChronoLayout
        .listEntries(Paths.get(dir, "t")).filter(_.bucket == "2024-03-01")
      assert(oldFile.size === 1)
      assert(db.cleanup("t", now = ts("2024-03-10 12:00:00")) ===
        Seq("2024-03-01"))
      // invisible to scans NOW, still on disk (pre-cleanup reader safe)
      assert(db.table("t").count() === 1L)
      assert(spark.read.parquet(s"$preOld/${oldFile.head.file}").count() === 1L)
      // a second cleanup does not re-count the lingering dir
      assert(db.cleanup("t", now = ts("2024-03-10 12:00:00")) === Seq.empty)
      Thread.sleep(600)
      assert(db.vacuumOrphans("t") === 1)
      // the emptied bucket dir is gone with its last file
      assert(!Files.exists(Paths.get(preOld)))
      assert(db.manifestConsistent("t"))
    } finally db.close()
  }

  test("grace off (default): compact deletes superseded files immediately (r16 behavior)") {
    val (db, dir) = mk(graceMs = 0)
    try {
      db.createTable("t")
      frag(db, 3)
      assert(db.compact("t") === 1)
      assert(diskFiles(dir).size === 1)
      assert(!Files.exists(Paths.get(dir, "t", "_trash")))
    } finally db.close()
  }
}
