package graft.core

import graft.SparkSuite
import java.nio.file.Files
import java.sql.Timestamp

class MaintenanceSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def row(k: String, t: String) = ChronoRow(k, ts(t), Array[Byte](1))

  test("zorder verb: integral/timestamp/DATE dims re-cluster, content preserved; strings refused") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val zdir = Files.createTempDirectory("zverb").toString
    val db = new ChronoDB(spark,
      ChronoConfig(zdir,
        bucket = "day", sketchLgK = 0, sketchCmsDepth = 0,
        sketchBloomKeys = 0, writersPerBucket = 1))
    try {
      db.createTable("t", StructType(Seq(
        StructField("key", StringType), StructField("ts", TimestampType),
        StructField("d", DateType), StructField("v", LongType))))
      val df = spark.range(200).selectExpr(
        "cast(id as string) as key",
        "timestamp_micros(1704067200000000 + (id % 3) * 86400000000) as ts",
        "date_add(date'2024-01-01', cast(id % 40 as int)) as d",
        "id as v")
      db.insertFrame("t", df)
      val before = db.table("t").select(col("key"), col("d"), col("v"))
        .collect().map(r => (r.getString(0), r.getDate(1).toString,
          r.getLong(2))).sorted.toSeq
      // a crashed predecessor's staging dir must be swept by the verb
      val staleStage = java.nio.file.Paths.get(
        zdir, "t", "_staging", "rewrite-deadbeef")
      java.nio.file.Files.createDirectories(staleStage)
      // DATE participates as a z-dimension (unix_date scaling)
      assert(db.zorder("t", Seq("d", "v")) >= 1)
      val after = db.table("t").select(col("key"), col("d"), col("v"))
        .collect().map(r => (r.getString(0), r.getDate(1).toString,
          r.getLong(2))).sorted.toSeq
      assert(after === before)
      assert(db.manifestConsistent("t"))
      // stage-then-adopt hygiene (VERDICT r18 #2): no rewrite staging
      // survives the verb — neither this run's dir nor the stale one
      import scala.jdk.CollectionConverters._
      val stagingRoot = java.nio.file.Paths.get(zdir, "t", "_staging")
      assert(!java.nio.file.Files.exists(staleStage))
      assert(!java.nio.file.Files.exists(stagingRoot) ||
        java.nio.file.Files.list(stagingRoot).iterator().asScala
          .forall(p => !p.getFileName.toString.startsWith("rewrite-")))
      val e = intercept[IllegalArgumentException](
        db.zorder("t", Seq("key", "v")))
      assert(e.getMessage.contains("only integral, timestamp, and date"))
    } finally db.close()
  }

  test("leader-or-skip under shared writers: two handles' tickers, ONE compact executed (VERDICT r18)") {
    val dir = Files.createTempDirectory("mleader").toString
    def cfg = ChronoConfig(dir, bucket = "hour", sketchLgK = 0,
      sketchCmsDepth = 0, sketchBloomKeys = 0, writersPerBucket = 1,
      compactFileThreshold = 2, lockMode = "verb", lockWaitMs = 120000L)
    val a = new ChronoDB(spark, cfg)
    val b = new ChronoDB(spark, cfg)
    try {
      a.createTable("t")
      // 3 files in one bucket → a compaction victim for whoever runs
      (1 to 3).foreach(i => a.insertSeq("t",
        Seq(row(s"k$i", "2024-01-01 12:00:00"))))
      val ma = new Maintenance(a, () => a.listTables(),
        minTickIntervalMs = 3600000L)
      val mb = new Maintenance(b, () => b.listTables(),
        minTickIntervalMs = 3600000L)
      val now = new Timestamp(System.currentTimeMillis())
      val (c1, _) = ma.tick(now)
      val (c2, _) = mb.tick(now)
      assert(c1 + c2 === 1,
        s"exactly one ticker must win the window (got $c1 + $c2)")
      assert((ma.skippedTables ++ mb.skippedTables) === Seq("t"),
        "the loser records the skip")
      // past the window, work is claimable again (nothing left to
      // compact — the point is the claim succeeds, not more rewrites)
      val later = new Timestamp(now.getTime + 3600001L)
      val (c3, _) = ma.tick(later)
      assert(c3 === 0 && ma.skippedTables.isEmpty)
    } finally { a.close(); b.close() }
  }

  test("tick compacts fragmented buckets and drops expired ones") {
    val db = new ChronoDB(spark,
      ChronoConfig(Files.createTempDirectory("maint").toString,
        ttl = Some(7200), compactFileThreshold = 2))
    db.createTable("a"); db.createTable("b")
    val now = ts("2024-01-01 12:30:00")
    // table a: fragmented current bucket (4 inserts, same hour)
    (1 to 4).foreach(i => db.insertSeq("a", Seq(row(s"k$i", s"2024-01-01 12:0$i:00")), now))
    // table b: one live bucket, one wholly expired bucket
    db.insertSeq("b", Seq(row("old", "2024-01-01 08:30:00")), ts("2024-01-01 09:00:00"))
    db.insertSeq("b", Seq(row("new", "2024-01-01 12:00:00")), now)

    val (compacted, dropped) = new Maintenance(db, () => db.listTables()).tick(now)
    assert(compacted === 1) // a's hour-12 bucket rewritten
    assert(dropped === 1)   // b's hour-08 bucket removed
    assert(db.table("a").count() === 4)
    assert(db.table("b").count() === 1)
  }

  test("opt-in tick extras: orphan vacuum + bucketed-twin refresh, off by default") {
    val root = Files.createTempDirectory("maintx").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "hour", keyBuckets = 4))
    db.createTable("t")
    val now = ts("2024-01-01 12:30:00")
    db.insertSeq("t", Seq(row("a", "2024-01-01 12:01:00")), now)
    db.rebuildBucketed("t")
    // plant an aged orphan (crashed insert) in the live bucket
    val bucket = java.nio.file.Paths.get(root, "t", "bucket=2024-01-01-12")
    val part = Files.list(bucket).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val orphan = bucket.resolve("part-orphan.parquet")
    Files.copy(part, orphan)
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200 * 1000L))
    // defaults: neither extra runs
    val m0 = new Maintenance(db, () => db.listTables())
    m0.tick(now)
    assert(m0.vacuumedCount === 0 && m0.bucketedRefreshes.isEmpty)
    assert(Files.exists(orphan))
    // opted in: orphan vacuumed, twin refreshed with the post-insert delta
    db.insertSeq("t", Seq(row("b", "2024-01-01 12:02:00")), now)
    val m = new Maintenance(db, () => db.listTables(),
      vacuumOrphansAfterMs = 3600 * 1000L, autoRefreshBucketed = true)
    m.tick(now)
    assert(m.vacuumedCount === 1)
    assert(!Files.exists(orphan))
    assert(m.bucketedRefreshes.map(_._1) === Seq("t"))
    assert(db.bucketedTable("t").count() === 2)
    // quiet second tick: nothing to vacuum, twin already current
    m.tick(now)
    assert(m.vacuumedCount === 0)
    assert(m.bucketedRefreshes === Seq("t" -> BucketedRefresh("noop", 0)))
    db.close()
  }

  test("autoAnnDeltaFold tick folds insert staleness BEFORE compact; never escalates to a rebuild") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val db = new ChronoDB(spark,
      ChronoConfig(Files.createTempDirectory("maintann").toString,
        bucket = "day", sketchLgK = 0, sketchCmsDepth = 0,
        sketchBloomKeys = 0, compactFileThreshold = 1))
    try {
      db.createTable("e", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("ts", TimestampType),
        StructField("embedding", ArrayType(FloatType)))))
      def rows(lo: Long, hi: Long, day: String) = spark.range(lo, hi)
        .selectExpr("id as vec_id", s"timestamp'$day 10:00:00' as ts",
          """transform(sequence(0, 7), j -> cast(
             |  (case when j = cast(id % 2 as int) then 1.0 else 0.0 end)
             |  + sin(id * 7 + j) * 0.1 as float)) as embedding""".stripMargin)
      db.insertFrame("e", rows(0, 100, "2024-01-01"))
      db.buildAnnIndex("e", "vec_id", "embedding", nlist = 4, seed = 1L)
      // fragment ONE bucket post-build so compact has a victim that
      // would fold the delta if the tick ran compact first
      db.insertFrame("e", rows(100, 130, "2024-01-02"))
      db.insertFrame("e", rows(130, 150, "2024-01-02"))
      assert(db.annServeState("e").isInstanceOf[AnnServeState.InsertDelta])
      val m = new Maintenance(db, () => Seq("e"), autoAnnDeltaFold = true)
      val (compacted, _) = m.tick()
      assert(compacted >= 1, "the fragmented delta bucket must compact")
      assert(m.annFoldedTables === Seq("e"))
      // fold ran BEFORE compact, so the post-compact index is FRESH
      // (compact of an already-folded index is content-preserving)
      assert(db.annIndexFresh("e"))
      assert(db.annStoredAssignments("e").count() === 150L)
      // a row REWRITE is never repaired by the ticker — deliberate act
      db.deleteWhere("e", col("vec_id") === 0L)
      m.tick()
      assert(m.annFoldedTables.isEmpty)
      assert(db.annServeState("e").isInstanceOf[AnnServeState.Unservable],
        "the ticker must not escalate to a full rebuild")
      // default stays off
      db.insertFrame("e", rows(150, 151, "2024-01-03"))
      db.buildAnnIndexIfStale("e") // repair deliberately
      db.insertFrame("e", rows(151, 152, "2024-01-03"))
      val mOff = new Maintenance(db, () => Seq("e"))
      mOff.tick()
      assert(mOff.annFoldedTables.isEmpty)
    } finally db.close()
  }

  test("tick surfaces sidecar inconsistency; autoRepairSidecars heals it in-pass") {
    val root = Files.createTempDirectory("maintcons")
    val db = new ChronoDB(spark, ChronoConfig(root.toString))
    db.createTable("t")
    db.insertSeq("t", Seq(row("a", "2024-01-01 08:10:00"),
      row("b", "2024-01-01 08:20:00")))
    assert(db.sidecarsConsistent("t"))
    // seed the insert partial-failure window: data landed, sidecar gone
    val s = Files.walk(root.resolve("t/_stats"))
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(Files.delete(_))
    finally s.close()
    assert(!db.sidecarsConsistent("t"))

    // detection-only mode: loudly counted, NOT repaired
    val m = new Maintenance(db, () => Seq("t"))
    m.tick()
    assert(m.inconsistentSidecars === Seq("t"))
    assert(!db.sidecarsConsistent("t"))

    // repair mode: same detection, plus rebuild in the same pass
    val m2 = new Maintenance(db, () => Seq("t"), autoRepairSidecars = true)
    m2.tick()
    assert(m2.inconsistentSidecars === Seq("t")) // it WAS inconsistent
    assert(db.sidecarsConsistent("t"))
    m2.tick()
    assert(m2.inconsistentSidecars.isEmpty) // healed: next pass is clean
    db.close()
  }

  test("tiered check: count drift is invisible to the quick pass, caught on the full-check tick") {
    val root = Files.createTempDirectory("mainttier")
    val db = new ChronoDB(spark, ChronoConfig(root.toString))
    db.createTable("t")
    // two batches into the SAME bucket → two sidecar files; deleting one
    // leaves the bucket covered (quick check blind) but its n drifted
    db.insertSeq("t", Seq(row("a", "2024-01-01 08:10:00")))
    db.insertSeq("t", Seq(row("b", "2024-01-01 08:20:00")))
    val files = Files.list(root.resolve("t/_stats"))
      .filter(_.toString.endsWith(".parquet")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
    assert(files.length >= 2)
    Files.delete(files.head)
    assert(db.sidecarCoverageGaps("t").isEmpty) // covered, hence quick-blind
    assert(!db.sidecarsConsistent("t"))         // but anchors drifted

    val m = new Maintenance(db, () => Seq("t"), fullCheckEvery = 2)
    m.tick()                                    // tick 1: quick only
    assert(m.inconsistentSidecars.isEmpty)
    m.tick()                                    // tick 2: full check fires
    assert(m.inconsistentSidecars === Seq("t"))
    db.close()
  }

  test("autoAnalyze tick rebuilds stale _colstats; current stats are a no-op") {
    val db = new ChronoDB(spark,
      ChronoConfig(Files.createTempDirectory("maintan").toString))
    db.createTable("t")
    db.insertSeq("t", (0 until 30).map(i => row(s"k$i", f"2024-01-01 10:${2 * i}%02d:00")))
    // post-insert state: stats invalidated → estimates have no sidecar
    intercept[IllegalStateException](
      db.estimateRowsInRange("t", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
    val m = new Maintenance(db, () => db.listTables(), autoAnalyze = true)
    m.tick(ts("2024-01-01 11:00:00"))
    assert(m.analyzedTables === Seq("t"))
    // estimates now answered from the rebuilt sidecar
    assert(db.estimateRowsInRange("t",
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:58:00")) > 0.0)
    // second tick: stats current → ANALYZE is a no-op
    m.tick(ts("2024-01-01 11:05:00"))
    assert(m.analyzedTables.isEmpty)
    // default-off ticker never analyzes
    val db2 = new ChronoDB(spark,
      ChronoConfig(Files.createTempDirectory("maintan2").toString))
    db2.createTable("t")
    db2.insertSeq("t", Seq(row("k", "2024-01-01 10:00:00")))
    new Maintenance(db2, () => db2.listTables()).tick(ts("2024-01-01 11:00:00"))
    intercept[IllegalStateException](
      db2.estimateRowsInRange("t", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
    db.close(); db2.close()
  }

  test("a throwing table doesn't kill the loop silently: counted, logged, recovers") {
    val db = new ChronoDB(spark,
      ChronoConfig(Files.createTempDirectory("maintfail").toString))
    db.createTable("ok")
    // table list names a table that doesn't exist → tick throws inside
    @volatile var tables = Seq("ok", "ghost")
    val m = new Maintenance(db, () => tables)
    m.safeTick()
    assert(m.consecutiveFailures === 1)
    assert(m.lastError.exists(_.isInstanceOf[TableNotFoundException]))
    m.safeTick()
    assert(m.consecutiveFailures === 2) // streak grows while failing
    tables = Seq("ok")
    m.safeTick()
    assert(m.consecutiveFailures === 0) // success clears the streak
    assert(m.lastError.isEmpty)
    // fatal errors are NOT swallowed
    val fatal = new Maintenance(db, () => throw new OutOfMemoryError("boom"))
    intercept[OutOfMemoryError](fatal.safeTick())
  }
}
