package graft.core

import graft.SparkSuite
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

/** The `_manifest` sidecar + [[ManifestFileIndex]]: scan planning from
  * recorded file metadata instead of directory listing (VERDICT r12
  * missing #1). Pins (1) that the manifest path is actually PLANNING
  * the scans (the relation's FileIndex is ManifestFileIndex, not a
  * silent fallback to InMemoryFileIndex), (2) commit-point visibility
  * semantics, (3) mutation-path refresh, (4) consistency detection +
  * repair, (5) legacy-path equivalence. */
class ManifestSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def row(k: String, t: String, d: String = "x") =
    ChronoRow(k, ts(t), d.getBytes("UTF-8"))

  private def freshDb(manifest: Boolean = true): (ChronoDB, String) = {
    val dir = Files.createTempDirectory("manifest").toString
    (new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      compactFileThreshold = 2, writersPerBucket = 1, manifest = manifest)), dir)
  }

  /** The FileIndex class actually planning a DataFrame's scan. */
  private def indexClasses(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.getClass.getSimpleName
          case other => other.getClass.getSimpleName
        }
    }

  test("insert writes _manifest and table() plans from ManifestFileIndex") {
    val (db, dir) = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:10:00"),
      row("b", "2024-01-01 11:20:00"),
      row("c", "2024-01-01 12:30:00")))
    assert(Files.exists(Paths.get(dir, "t", "_manifest")))
    val df = db.table("t")
    assert(indexClasses(df) === Seq("ManifestFileIndex"),
      "table() must plan from the manifest, not a listing")
    assert(df.count() === 3)
    assert(db.manifestConsistent("t"))
    db.close()
  }

  test("manifest scan equals the legacy listing scan row for row") {
    val (db, dir) = freshDb()
    db.createTable("t")
    val rows = (0 until 50).map(i =>
      row(f"k$i%03d", f"2024-01-01 ${10 + i % 4}%02d:0${i % 6}:00", s"v$i"))
    db.insertSeq("t", rows)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"key", $"ts", $"data".cast("string"), $"bucket")
        .as[(String, Timestamp, String, String)].collect().sorted
    val viaManifest = canon(db.table("t"))
    db.close() // release the LOCK before reopening in legacy mode
    val legacy = new ChronoDB(spark,
      ChronoConfig(dir, bucket = "hour", manifest = false))
    assert(indexClasses(legacy.table("t")) === Seq("InMemoryFileIndex"))
    assert(viaManifest.toSeq === canon(legacy.table("t")).toSeq)
    legacy.close()
  }

  test("partition pruning happens inside ManifestFileIndex.listFiles") {
    val (db, _) = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:10:00"),
      row("b", "2024-01-01 11:20:00"),
      row("c", "2024-01-01 12:30:00"),
      row("d", "2024-01-01 13:40:00")))
    val q = db.query("t",
      ts("2024-01-01 11:00:00"), ts("2024-01-01 12:59:59"))
    q.collect()
    val scanned = PlanMetrics.scannedFiles(q.queryExecution.executedPlan)
    assert(scanned === 2,
      s"range over 2 of 4 hourly buckets must plan 2 files, planned $scanned")
    db.close()
  }

  test("queryKey loads only candidate buckets' manifest entries") {
    val (db, _) = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("needle", "2024-01-01 10:10:00"),
      row("hay1", "2024-01-01 11:20:00"),
      row("hay2", "2024-01-01 12:30:00"),
      row("needle", "2024-01-01 13:40:00")))
    val q = db.queryKey("t", "needle")
    assert(q.collect().length === 2)
    val scanned = PlanMetrics.scannedFiles(q.queryExecution.executedPlan)
    assert(scanned === 2,
      s"bloom-pruned lookup must plan the 2 needle buckets, planned $scanned")
    db.close()
  }

  test("commit point: files on disk but not in the manifest are invisible; rebuildManifest adopts") {
    val (db, dir) = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(row("a", "2024-01-01 10:10:00")))
    // simulate a crashed insert: copy the committed file in as an orphan
    val bucket = Paths.get(dir, "t", "bucket=2024-01-01-10")
    val part = Files.list(bucket).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part, bucket.resolve("orphan.parquet"))
    assert(db.table("t").count() === 1, "orphan must stay invisible")
    assert(!db.manifestConsistent("t"), "orphan must fail the check")
    assert(!db.sidecarsConsistent("t"))
    db.rebuildManifest("t")
    assert(db.table("t").count() === 2, "rebuild adopts the orphan file")
    assert(db.manifestConsistent("t"))
    db.close()
  }

  test("a crashed insert's orphan is NOT adopted by the next insert into the same bucket") {
    val (db, dir) = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(row("a", "2024-01-01 10:10:00")))
    // simulate a CRASHED EARLIER insert: an unrecorded file whose mtime
    // predates the next insert (the crash happened before it, by
    // construction of the single-writer LOCK)
    val bucket = Paths.get(dir, "t", "bucket=2024-01-01-10")
    val part = Files.list(bucket).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val orphan = bucket.resolve("part-orphan.parquet")
    Files.copy(part, orphan)
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000L))
    // next insert into the SAME bucket: must record only its own files
    db.insertSeq("t", Seq(row("b", "2024-01-01 10:20:00")))
    assert(db.table("t").count() === 2,
      "the crashed batch's orphan must stay invisible — re-running the " +
        "crashed insert would otherwise duplicate its rows")
    assert(!db.manifestConsistent("t"), "orphan must still fail the check")
    db.rebuildManifest("t") // the deliberate adoption verb
    assert(db.table("t").count() === 3)
    assert(db.manifestConsistent("t"))
    db.close()
  }

  test("vacuumOrphans deletes only aged unmanifested files; live data and in-flight files survive") {
    val (db, dir) = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(row("a", "2024-01-01 10:10:00")))
    val bucket = Paths.get(dir, "t", "bucket=2024-01-01-10")
    val part = Files.list(bucket).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    // an AGED orphan (crashed insert long ago) and a FRESH unrecorded
    // file (an insert that could still be in flight — its manifest
    // append hasn't landed yet)
    val aged = bucket.resolve("part-orphan-old.parquet")
    val fresh = bucket.resolve("part-orphan-new.parquet")
    Files.copy(part, aged)
    Files.copy(part, fresh)
    Files.setLastModifiedTime(aged,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200 * 1000L))
    assert(db.vacuumOrphans("t", horizonMs = 3600 * 1000L) === 1)
    assert(!Files.exists(aged), "aged orphan must be deleted")
    assert(Files.exists(fresh), "fresh unrecorded file is inside the " +
      "horizon — a live insert could still own it")
    assert(Files.exists(part), "manifested data files must survive")
    assert(db.table("t").count() === 1)
    // after the fresh file ages past the horizon, a second vacuum
    // collects it too and the consistency check goes green again
    Files.setLastModifiedTime(fresh,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200 * 1000L))
    assert(db.vacuumOrphans("t", horizonMs = 3600 * 1000L) === 1)
    assert(db.manifestConsistent("t"))
    // no manifest → no-op (every on-disk file IS the table)
    val (db2, dir2) = freshDb(manifest = false)
    db2.createTable("u")
    db2.insertSeq("u", Seq(row("a", "2024-01-01 10:10:00")))
    assert(db2.vacuumOrphans("u", horizonMs = 0L) === 0)
    db2.close()
    db.close()
  }

  test("first manifested insert into a legacy table adopts every historical bucket") {
    val dir = Files.createTempDirectory("manifest").toString
    val legacy = new ChronoDB(spark,
      ChronoConfig(dir, bucket = "hour", manifest = false))
    legacy.createTable("t")
    legacy.insertSeq("t", Seq(
      row("a", "2024-01-01 10:10:00"),
      row("b", "2024-01-01 11:20:00")))
    assert(!Files.exists(Paths.get(dir, "t", "_manifest")))
    legacy.close()
    // reopen with the default manifest=true and insert into a NEW
    // bucket: a partial per-touched-bucket append would cover only the
    // 12h bucket and silently hide the historical 10h/11h ones
    val db = new ChronoDB(spark,
      ChronoConfig(dir, bucket = "hour", manifest = true))
    db.insertSeq("t", Seq(row("c", "2024-01-01 12:30:00")))
    assert(Files.exists(Paths.get(dir, "t", "_manifest")))
    val df = db.table("t")
    assert(indexClasses(df) === Seq("ManifestFileIndex"))
    assert(df.count() === 3,
      "historical buckets must be adopted, not silently hidden")
    assert(db.manifestConsistent("t"))
    db.close()
  }

  test("mutations through a manifest=false handle keep an existing _manifest fresh") {
    val dir = Files.createTempDirectory("manifest").toString
    def cfg(m: Boolean) = ChronoConfig(dir, bucket = "hour",
      compactFileThreshold = 1, writersPerBucket = 1, manifest = m)
    val db = new ChronoDB(spark, cfg(m = true))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:10:00"), row("b", "2024-01-01 10:20:00")))
    db.insertSeq("t", Seq(row("c", "2024-01-01 10:40:00")))
    db.close()
    // a manifest=false handle deletes, inserts, and compacts: all three
    // rewrite or extend the bucket's file set, and the existing sidecar
    // must follow — a stale one would dangle (FileNotFound) or hide
    // rows from the next manifest=true scan
    val off = new ChronoDB(spark, cfg(m = false))
    assert(off.deleteKeys("t", Seq("b")) === 1L)
    off.insertSeq("t", Seq(row("d", "2024-01-01 10:50:00")))
    assert(off.compact("t") > 0)
    off.close()
    val on = new ChronoDB(spark, cfg(m = true))
    assert(on.manifestConsistent("t"),
      "manifest must track mutations made through a manifest=false handle")
    val out = on.table("t").select($"key").as[String].collect().sorted
    assert(out.toSeq === Seq("a", "c", "d"))
    on.close()
  }

  test("manifest fragments fold at the checkpoint cadence") {
    val dir = Files.createTempDirectory("manifest").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      writersPerBucket = 1, manifest = true, manifestFoldFiles = 3))
    db.createTable("t")
    def frags(): Long = {
      val s = Files.list(Paths.get(dir, "t", "_manifest"))
      try s.filter(_.toString.endsWith(".parquet")).count() finally s.close()
    }
    // each batch appends one fragment; the 3rd append reaches the
    // threshold and folds to one — an ingest that never compacts now
    // pays an O(threshold) manifest read, not O(batches)
    db.insertSeq("t", Seq(row("a", "2024-01-01 10:10:00")))
    db.insertSeq("t", Seq(row("b", "2024-01-01 11:10:00")))
    assert(frags() === 2)
    db.insertSeq("t", Seq(row("c", "2024-01-01 12:10:00")))
    assert(frags() === 1, "threshold reached — fragments must fold to one")
    db.insertSeq("t", Seq(row("d", "2024-01-01 13:10:00")))
    assert(frags() === 2)
    assert(db.table("t").count() === 4)
    assert(db.manifestConsistent("t"))
    db.close()
  }

  test("deleteKeys / compact / cleanup keep the manifest consistent") {
    val dir = Files.createTempDirectory("manifest").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      ttl = Some(3600L * 24 * 365 * 50), compactFileThreshold = 1,
      writersPerBucket = 4, manifest = true))
    db.createTable("t")
    // two inserts → multiple files per bucket (compactFileThreshold=1)
    db.insertSeq("t", (0 until 20).map(i =>
      row(s"k$i", f"2024-01-01 ${10 + i % 2}%02d:00:0${i % 10}")))
    db.insertSeq("t", (0 until 20).map(i =>
      row(s"j$i", f"2024-01-01 ${10 + i % 2}%02d:30:0${i % 10}")))
    assert(db.manifestConsistent("t"))
    assert(db.deleteKeys("t", Seq("k3", "j7")) === 2L)
    assert(db.manifestConsistent("t"), "delete must refresh the manifest")
    assert(db.table("t").count() === 38)
    assert(db.compact("t") > 0)
    assert(db.manifestConsistent("t"), "compact must refresh the manifest")
    assert(db.table("t").count() === 38)
    // cleanup drops everything older than ~50y from "now" far in future
    val dropped = db.cleanup("t", ts("2090-01-01 00:00:00"))
    assert(dropped.nonEmpty)
    assert(db.manifestConsistent("t"), "cleanup must refresh the manifest")
    assert(db.table("t").count() === 0)
    db.close()
  }

  test("dangling manifest entries are detected and repaired by rebuildSidecars") {
    val (db, dir) = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:10:00"),
      row("b", "2024-01-01 11:20:00")))
    // simulate a crashed mutation: a recorded file vanishes
    val bucket = Paths.get(dir, "t", "bucket=2024-01-01-10")
    val part = Files.list(bucket).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.delete(part)
    assert(!db.manifestConsistent("t"))
    db.rebuildSidecars("t")
    assert(db.manifestConsistent("t"))
    assert(db.table("t").count() === 1)
    db.close()
  }

  test("ts range pushdown via BucketPruneRule works on the manifest relation") {
    Engine.installOptimizations(spark)
    val (db, _) = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:10:00"),
      row("b", "2024-01-01 11:20:00"),
      row("c", "2024-01-01 12:30:00")))
    // plain ts BETWEEN on the raw relation — no explicit bucket filter;
    // BucketPruneRule must derive the partition predicate from the ts
    // field metadata the manifest dataSchema carries
    val q = db.table("t").filter(
      org.apache.spark.sql.functions.col("ts")
        .between(lit("2024-01-01 11:00:00"), lit("2024-01-01 11:59:59")))
    assert(q.collect().length === 1)
    val scanned = PlanMetrics.scannedFiles(q.queryExecution.executedPlan)
    assert(scanned === 1,
      s"BucketPruneRule must prune to the single 11h bucket, planned $scanned")
    db.close()
  }

  test("cached manifest fold invalidates across handles: a sibling's insert and rewrite are visible immediately") {
    // the r20 manifestEntries cache is keyed on the _manifest dir's
    // file-listing signature, NOT the handle — this pins the contract
    // that no handle can serve a stale fold after ANY writer commits
    val dir = Files.createTempDirectory("manifest_cache").toString
    val cfg = ChronoConfig(dir, bucket = "hour", writersPerBucket = 1,
      manifest = true, lockMode = "verb")
    val h1 = new ChronoDB(spark, cfg)
    val h2 = new ChronoDB(spark, cfg)
    try {
      h1.createTable("t")
      h1.insertSeq("t", Seq(row("a", "2024-01-01 10:10:00")))
      assert(h1.table("t").count() === 1) // h1's cache now warm
      // sibling writes: h1's next read must see the new file set
      h2.insertSeq("t", Seq(row("b", "2024-01-01 11:20:00")))
      assert(h1.table("t").count() === 2,
        "h1 served a stale cached manifest after h2's insert")
      // sibling rewrite (delete rewrites a bucket + manifest refresh)
      h2.deleteKey("t", "a")
      assert(h1.table("t").count() === 1,
        "h1 served a stale cached manifest after h2's delete rewrite")
      assert(h1.table("t").select("key").collect().map(_.getString(0))
        .toSeq === Seq("b"))
    } finally { h1.close(); h2.close() }
  }

  private def lit(s: String) =
    org.apache.spark.sql.functions.lit(s).cast("timestamp")
}
