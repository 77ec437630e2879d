package graft.core

import graft.SparkSuite
import java.nio.file.Files
import java.sql.Timestamp

class ChronoDBSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def row(k: String, t: String, d: String = "x") =
    ChronoRow(k, ts(t), d.getBytes("UTF-8"))

  private def freshDb(ttl: Option[Long] = None): ChronoDB = {
    val dir = Files.createTempDirectory("chronodb").toString
    new ChronoDB(spark, ChronoConfig(dir, bucket = "hour", ttl = ttl,
      compactFileThreshold = 2))
  }

  test("create/list/drop table") {
    val db = freshDb()
    db.createTable("t1"); db.createTable("t2")
    assert(db.listTables() === Seq("t1", "t2"))
    intercept[TableAlreadyExistsException](db.createTable("t1"))
    db.dropTable("t1")
    assert(db.listTables() === Seq("t2"))
    intercept[TableNotFoundException](db.query("t1", ts("2024-01-01 00:00:00"),
      ts("2024-01-02 00:00:00")).count())
  }

  test("config validation rejects unusable knobs (reference config.go parity)") {
    val dir = Files.createTempDirectory("cfg").toString
    intercept[InvalidConfigException](
      new ChronoDB(spark, ChronoConfig(dir, bucket = "minute")))
    intercept[InvalidConfigException](
      new ChronoDB(spark, ChronoConfig(dir, ttl = Some(-5))))
    intercept[InvalidConfigException](
      new ChronoDB(spark, ChronoConfig(dir, compression = "lzw")))
  }

  test("query range is inclusive on both ends; duplicates preserved") {
    val db = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 09:59:59"),
      row("b", "2024-01-01 10:00:00"), // == start (kept)
      row("c", "2024-01-01 11:30:00"),
      row("c", "2024-01-01 11:30:00"), // duplicate (key, ts) — permitted
      row("d", "2024-01-01 12:00:00"), // == end (kept)
      row("e", "2024-01-01 12:00:01")))
    val out = db.query("t", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))
      .select("key").as[String].collect().sorted
    assert(out.toSeq === Seq("b", "c", "c", "d"))
  }

  test("queryOrdered implements the dead Query{Limit, Ascending} intent") {
    val db = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("b", "2024-01-01 10:00:00"),
      row("a", "2024-01-01 10:00:00"), // ts tie → key order decides
      row("c", "2024-01-01 11:00:00"),
      row("d", "2024-01-01 12:00:00")))
    val asc = db.queryOrdered("t", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
      .select("key").as[String].collect().toSeq
    assert(asc === Seq("a", "b", "c", "d"))
    val desc2 = db.queryOrdered("t", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"),
        ascending = false, limit = Some(2))
    assert(desc2.select("key").as[String].collect().toSeq === Seq("d", "c"))
    // with a limit the plan is a top-k heap, not a global sort
    assert(desc2.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("insert-time TTL drop is silent") {
    val db = freshDb(ttl = Some(3600))
    db.createTable("t")
    val now = ts("2024-01-02 12:00:00")
    db.insertSeq("t", Seq(
      row("old", "2024-01-02 10:00:00"),  // 2h old > 1h ttl → dropped
      row("new", "2024-01-02 11:30:01")), now)
    assert(db.table("t").count() === 1)
  }

  test("TTL keeps a row aged exactly ttl (reference table.go:93 boundary)") {
    val db = freshDb(ttl = Some(3600))
    db.createTable("t")
    val now = ts("2024-01-02 12:00:00")
    db.insertSeq("t", Seq(
      row("exact", "2024-01-02 11:00:00"),   // age == ttl → kept
      row("over", "2024-01-02 10:59:59")),   // age > ttl → dropped
      now)
    assert(db.table("t").select("key").as[String].collect().toSeq === Seq("exact"))
  }

  test("bucket labels pinned to UTC: query and cleanup correct under non-UTC session TZ") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val db = freshDb(ttl = Some(7200))
      db.createTable("t")
      db.insertSeq("t", Seq(
        row("a", "2024-01-01 09:15:00"),
        row("b", "2024-01-01 10:30:00"),
        row("c", "2024-01-01 11:10:00")),
        ts("2024-01-01 11:14:00"))
      // with session-TZ bucket labels these rows would land in buckets
      // 2024-01-01-01..03 and the UTC-formatted bucket predicate in
      // query() would silently drop them all
      val out = db.query("t", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))
        .select("key").as[String].collect().sorted.toSeq
      assert(out === Seq("b", "c"))
      // cleanup must not delete young buckets (TZ-shifted labels would
      // parse 8h older than they are and get reaped early)
      assert(db.cleanup("t", ts("2024-01-01 11:30:00")) === Seq.empty)
      val dropped = db.cleanup("t", ts("2024-01-01 13:00:00"))
      assert(dropped.sorted === Seq("2024-01-01-09", "2024-01-01-10"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("cleanup drops whole expired buckets only (bucket granularity)") {
    val db = freshDb(ttl = Some(7200)) // 2h
    db.createTable("t")
    val now = ts("2024-01-01 13:00:00")
    // insert "at" 11:14 so the TTL insert-gate keeps all four rows
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 09:15:00"),  // bucket 09 (ends 10:00 <= 11:00 cutoff)
      row("b", "2024-01-01 10:30:00"),  // bucket 10 (ends 11:00 <= cutoff) — dropped
      row("c", "2024-01-01 10:59:00"),  // bucket 10
      row("d", "2024-01-01 11:10:00")), // bucket 11 — survives
      ts("2024-01-01 11:14:00"))
    val dropped = db.cleanup("t", now)
    assert(dropped.sorted === Seq("2024-01-01-09", "2024-01-01-10"))
    assert(db.table("t").select("key").as[String].collect().toSeq === Seq("d"))
  }

  test("compact merges over-fragmented buckets, preserves rows") {
    val db = freshDb()
    db.createTable("t")
    // 4 separate inserts into the same bucket → 4+ files
    (1 to 4).foreach { i =>
      db.insertSeq("t", Seq(row(s"k$i", s"2024-01-01 10:0$i:00")))
    }
    val before = db.stats("t")
    assert(before.numFiles >= 4)
    val nCompacted = db.compact("t")
    assert(nCompacted === 1)
    val after = db.stats("t")
    assert(after.numRows === before.numRows)
    assert(after.numFiles < before.numFiles)
    // untouched second compact is a no-op
    assert(db.compact("t") === 0)
  }

  test("stats reports rows, files, ts range") {
    val db = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 08:00:00"), row("b", "2024-01-01 09:30:00")))
    val s = db.stats("t")
    assert(s.numRows === 2)
    assert(s.minTs === Some(ts("2024-01-01 08:00:00")))
    assert(s.maxTs === Some(ts("2024-01-01 09:30:00")))
    assert(s.sizeBytes > 0)
  }

  test("backup and restore roundtrip") {
    val db = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(row("a", "2024-01-01 08:00:00")))
    val bak = Files.createTempDirectory("bak").toString + "/t"
    db.backup("t", bak)
    db.insertSeq("t", Seq(row("b", "2024-01-01 09:00:00")))
    assert(db.table("t").count() === 2)
    db.restore("t", bak)
    assert(db.table("t").select("key").as[String].collect().toSeq === Seq("a"))
  }

  test("lock file rejects double-open until close (fileutils.go:242-271 intent)") {
    val dir = Files.createTempDirectory("lock").toString
    val db1 = new ChronoDB(spark, ChronoConfig(dir))
    intercept[DatabaseLockedException](new ChronoDB(spark, ChronoConfig(dir)))
    db1.close()
    db1.close() // idempotent
    intercept[DatabaseClosedException](db1.listTables())
    intercept[DatabaseClosedException](db1.createTable("t"))
    val db2 = new ChronoDB(spark, ChronoConfig(dir)) // reopens after release
    assert(db2.listTables() === Seq.empty)
    db2.close()
  }

  test("backupAll/restoreAll snapshot and replace the whole table set") {
    val db = freshDb()
    db.createTable("t1"); db.createTable("t2")
    db.insertSeq("t1", Seq(row("a", "2024-01-01 08:00:00")))
    db.insertSeq("t2", Seq(row("b", "2024-01-01 09:00:00")))
    val bak = Files.createTempDirectory("bakall").toString
    db.backupAll(bak)
    // diverge after the snapshot: new rows AND a new table
    db.insertSeq("t1", Seq(row("c", "2024-01-01 10:00:00")))
    db.createTable("t3")
    db.restoreAll(bak)
    // table set replaced: t3 gone (reference clears its table map)
    assert(db.listTables() === Seq("t1", "t2"))
    assert(db.table("t1").select("key").as[String].collect().toSeq === Seq("a"))
    assert(db.table("t2").select("key").as[String].collect().toSeq === Seq("b"))
    intercept[InvalidConfigException](db.restoreAll(bak + "/nope"))
  }

  test("per-bucket sketch stats: merge path == direct path, folded by compact, pruned by cleanup") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("sketchdb").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      ttl = Some(7 * 24 * 3600L), compactFileThreshold = 1))
    db.createTable("t")
    // lock-step fixture: two insert batches, overlapping keys, 3 buckets
    val now = System.currentTimeMillis()
    val h0 = now - (now % 3600000L)
    def at(hourOff: Int, min: Int) = new Timestamp(h0 - hourOff * 3600000L + min * 60000L)
    db.insertSeq("t", (0 until 40).map(i => ChronoRow(s"k${i % 25}", at(2, i), Array[Byte](1))))
    db.insertSeq("t", (0 until 40).map(i => ChronoRow(s"k${i % 30}", at(1, i), Array[Byte](2))))
    db.insertSeq("t", (0 until 10).map(i => ChronoRow(s"k$i", at(0, i), Array[Byte](3))))
    // merge path: sidecar sketches only; direct path: rescan the rows
    val full = (new Timestamp(h0 - 2 * 3600000L), new Timestamp(h0 + 3599999L))
    def direct(start: Timestamp, end: Timestamp): Long =
      graft.operators.Sketches.hllDirect(
        db.query("t", start, end), Seq.empty, "key").head().getLong(0)
    assert(db.approxDistinctKeys("t", full._1, full._2) === direct(full._1, full._2))
    // sub-range (single bucket) agrees too
    val sub = (new Timestamp(h0 - 2 * 3600000L), new Timestamp(h0 - 2 * 3600000L + 3599999L))
    assert(db.approxDistinctKeys("t", sub._1, sub._2) === direct(sub._1, sub._2))
    // two insert batches landed in the middle bucket? no — batches are
    // bucket-disjoint here, so force the multi-row case: another batch
    // into the newest bucket, then verify the merged row still matches
    db.insertSeq("t", (5 until 20).map(i => ChronoRow(s"k$i", at(0, 30 + i % 20), Array[Byte](4))))
    assert(db.approxDistinctKeys("t", full._1, full._2) === direct(full._1, full._2))
    // compact folds the sidecar to one row per bucket, estimates intact
    val before = db.approxDistinctKeys("t", full._1, full._2)
    db.compact("t")
    val statRows = spark.read.parquet(s"$dir/t/_stats")
    assert(statRows.groupBy(col("bucket")).count()
      .filter(col("count") > 1).count() === 0)
    assert(db.approxDistinctKeys("t", full._1, full._2) === before)
    // cleanup prunes dropped buckets from the sidecar: age the two old
    // buckets out, the estimate must now cover only the survivor
    val later = new Timestamp(h0 + 7 * 24 * 3600000L + 3600000L)
    val dropped = db.cleanup("t", later)
    assert(dropped.nonEmpty)
    assert(db.approxDistinctKeys("t", full._1, full._2) === direct(full._1, full._2))
    val sidecarBuckets = db.sketchStats("t").select("bucket")
      .as[String].collect().toSet
    dropped.foreach(b => assert(!sidecarBuckets.contains(b)))
    db.close()
  }

  test("CMS sidecar: merged range counters equal the direct sketch; estimates upper-bound truth") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("cmsdb").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      sketchCmsDepth = 4, sketchCmsWidth = 64))
    db.createTable("t")
    val now = System.currentTimeMillis()
    val h0 = now - (now % 3600000L)
    def at(hourOff: Int, min: Int) = new Timestamp(h0 - hourOff * 3600000L + min * 60000L)
    // two batches, skewed keys, two buckets
    db.insertSeq("t", (0 until 50).map(i => ChronoRow(s"k${i % 7}", at(1, i), Array[Byte](1))))
    db.insertSeq("t", (0 until 30).map(i => ChronoRow(s"k${i % 5}", at(0, i), Array[Byte](2))))
    val full = (new Timestamp(h0 - 3600000L), new Timestamp(h0 + 3599999L))
    // merged counter table == sketch built directly over the rows
    val merged = db.cmsStats("t")
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val direct = graft.operators.Sketches.cmsBuild(
        db.query("t", full._1, full._2), "key", depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === direct)
    // probe estimates: exact reproducibility + upper bound
    val probes = (0 until 7).map(i => s"k$i").toDF("key")
    val est = db.approxKeyCounts("t", full._1, full._2, probes, "key")
      .as[(String, Long)].collect().toMap
    val exact = db.query("t", full._1, full._2).groupBy(col("key")).count()
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k: est ${est(k)} < $n") }
    // sub-range (newest bucket only) merges fewer counters
    val sub = db.approxKeyCounts("t", new Timestamp(h0), full._2, probes, "key")
      .as[(String, Long)].collect().toMap
    assert(sub("k6") === 0L) // k6 only exists in the older bucket
    // compact folds; cleanup prunes — estimates track the surviving data
    db.compact("t")
    val afterCompact = db.cmsStats("t")
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(afterCompact === direct)
    db.close()
  }

  // --- sidecar durability (rewriteSidecar rename-aside protocol +
  //     insert partial-failure detect/repair) ---

  private def cpDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    val s = Files.walk(src)
    try s.forEach { f =>
      val t = dst.resolve(src.relativize(f))
      if (Files.isDirectory(f)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(f, t) }
    } finally s.close()
  }
  private def rmDir(p: java.nio.file.Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(Files.delete(_))
    finally s.close()
  }

  test("rewriteSidecar crash windows: every interrupted swap state recovers losslessly") {
    val root = Files.createTempDirectory("crashdb")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour",
      sketchCmsDepth = 0))
    db.createTable("t")
    val now = System.currentTimeMillis()
    val h0 = now - (now % 3600000L)
    def at(min: Int) = new Timestamp(h0 + min * 60000L)
    db.insertSeq("t", (0 until 40).map(i => ChronoRow(s"k${i % 25}", at(i), Array[Byte](1))))
    val lo = new Timestamp(h0); val hi = new Timestamp(h0 + 3599999L)
    val want = db.approxDistinctKeys("t", lo, hi)
    assert(want > 0)
    val stats = root.resolve("t/_stats")
    val tmp = root.resolve("t/_stats.tmp")
    val old = root.resolve("t/_stats.old")
    // a COMPLETE staged dir carries _SUCCESS by protocol (Spark's job
    // commit or SidecarIO.writeStagedDir); the live dir copied here was
    // append-written (driver-side since r21 — no _SUCCESS), so the
    // simulation stamps the marker the real staging write would leave
    def stageComplete(): Unit = {
      cpDir(stats, tmp)
      val s = tmp.resolve("_SUCCESS")
      if (!Files.exists(s)) Files.createFile(s)
    }

    // crash window 1: .tmp fully staged, live dir untouched (crash
    // before the first rename) → live dir wins, stale tmp cleared
    stageComplete()
    assert(db.approxDistinctKeys("t", lo, hi) === want)
    assert(!Files.exists(tmp))

    // crash window 2: live dir renamed aside, COMPLETE .tmp not yet
    // moved in (crash between the two renames) → tmp is promoted
    stageComplete()
    Files.move(stats, old)
    assert(db.approxDistinctKeys("t", lo, hi) === want)
    assert(Files.exists(stats) && !Files.exists(tmp) && !Files.exists(old))

    // crash window 3: like 2 but the staged .tmp is INCOMPLETE (no
    // _SUCCESS — the write itself was the casualty) → .old restored
    stageComplete()
    Files.delete(tmp.resolve("_SUCCESS"))
    Files.move(stats, old)
    assert(db.approxDistinctKeys("t", lo, hi) === want)
    assert(Files.exists(stats) && !Files.exists(tmp) && !Files.exists(old))

    // the old delete-then-move hole: with rename-aside there is NO state
    // in which the sidecar silently reads as empty — re-verified above
    // (every window returned `want`, never 0)
    db.close()
  }

  test("leftover sidecar staging dirs are never counted as table data") {
    val root = Files.createTempDirectory("staledb")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour"))
    db.createTable("t")
    db.insertSeq("t", Seq(row("a", "2024-01-01 08:00:00")))
    val before = db.stats("t")
    // a crashed rewrite's leftover .tmp holds real parquet — it must be
    // invisible to hasData/stats/table (the old isSidecar missed it)
    cpDir(root.resolve("t/_stats"), root.resolve("t/_stats.tmp"))
    assert(db.stats("t").numFiles === before.numFiles)
    assert(db.table("t").count() === before.numRows)
    db.close()
  }

  test("insert partial failure (data landed, sidecar lost) is detected and repaired") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("repairdb")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour",
      sketchCmsDepth = 4, sketchCmsWidth = 64))
    db.createTable("t")
    val now = System.currentTimeMillis()
    val h0 = now - (now % 3600000L)
    def at(min: Int) = new Timestamp(h0 + min * 60000L)
    db.insertSeq("t", (0 until 30).map(i => ChronoRow(s"k${i % 9}", at(i), Array[Byte](1))))
    db.insertSeq("t", (0 until 20).map(i => ChronoRow(s"k${i % 13}", at(30 + i), Array[Byte](2))))
    assert(db.sidecarsConsistent("t"))
    val lo = new Timestamp(h0); val hi = new Timestamp(h0 + 3599999L)
    val wantDistinct = db.approxDistinctKeys("t", lo, hi)

    // simulate: second insert's sidecar write crashed after the data
    // landed — drop one batch's appended sidecar file (undercount, the
    // silent kind the n-anchor exists to catch)
    val statFiles = Files.list(root.resolve("t/_stats"))
      .filter(_.toString.endsWith(".parquet")).toArray.map(_.asInstanceOf[java.nio.file.Path])
    assert(statFiles.length >= 2)
    Files.delete(statFiles.head)
    assert(!db.sidecarsConsistent("t"))

    // simulate the total loss too: sidecar never written at all
    rmDir(root.resolve("t/_stats"))
    assert(!db.sidecarsConsistent("t"))

    // repair rebuilds every enabled sidecar from the data
    db.rebuildSidecars("t")
    assert(db.sidecarsConsistent("t"))
    assert(db.approxDistinctKeys("t", lo, hi) === wantDistinct)
    // CMS upper bound holds again after rebuild
    val probes = (0 until 13).map(i => s"k$i").toDF("key")
    val est = db.approxKeyCounts("t", lo, hi, probes, "key")
      .as[(String, Long)].collect().toMap
    val exact = db.query("t", lo, hi).groupBy(col("key")).count()
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k: est ${est(k)} < $n") }
    db.close()
  }

  test("range query reads only in-range buckets' files (tablet-skip at file granularity)") {
    val root = Files.createTempDirectory("prunedb")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour"))
    db.createTable("t")
    // 6 hour-buckets x 2 insert batches => at least 2 files per bucket
    db.insertSeq("t", (0 until 6).map(h => row(s"a$h", f"2024-01-01 $h%02d:15:00")))
    db.insertSeq("t", (0 until 6).map(h => row(s"b$h", f"2024-01-01 $h%02d:45:00")))
    def filesIn(bucket: String): Int = {
      val d = root.resolve(s"t/bucket=$bucket").toFile
      if (!d.exists()) 0
      else d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    val inRange = Seq("2024-01-01-02", "2024-01-01-03").map(filesIn).sum
    val total = (0 until 6).map(h => filesIn(f"2024-01-01-0$h%01d")).sum
    assert(inRange >= 2 && total > inRange) // non-vacuous: pruning has work to do
    val q = db.query("t", ts("2024-01-01 02:00:00"), ts("2024-01-01 03:59:59"))
    // execute q ITSELF (a derived .select would build a separate plan
    // whose metrics never flow back to q.queryExecution)
    val got = q.collect().map(_.getAs[String]("key")).sorted
    assert(got.toSeq === Seq("a2", "a3", "b2", "b3"))
    // the metric is on the executed scan node of the SAME Dataset
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no FileSourceScanExec found in the executed plan")
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    // the reference skips whole tablets by min/max (table.go:146-150);
    // partition pruning on the derived bucket predicate must do the
    // same at file granularity — an unpruned scan would read `total`
    assert(numFiles === inRange,
      s"scan read $numFiles files; only the $inRange in-range bucket files should be touched")
    db.close()
  }

  test("_colstats: estimates within the histogram error bound, surviving compact and cleanup") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("colstatsdb")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour",
      ttl = Some(4 * 3600L), compactFileThreshold = 2))
    db.createTable("t")
    val insertNow = ts("2024-01-01 03:59:00")
    // 3 batches (fragmentation for compact) over hours 00-03, minutes
    // deliberately non-uniform so interpolation really is approximate
    def mk(seed: Int) = (0 until 60 by 2).flatMap { m =>
      (0 until 4).map(h => row(s"k$seed-$h-$m",
        f"2024-01-01 $h%02d:${(m * seed * 7 + h) % 60}%02d:${seed * 11 % 60}%02d"))
    }
    (1 to 3).foreach(s => db.insertSeq("t", mk(s), insertNow))
    db.rebuildColStats("t", nHist = 8)

    val cs = db.colStats("t").collect()
    assert(cs.nonEmpty)
    def usOf(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
    def errBound(lo: Timestamp, hi: Timestamp): Long = {
      val (qlo, qhi) = (usOf(lo), usOf(hi))
      cs.filter { r =>
        val (l, h) = (r.getLong(r.fieldIndex("lo")), r.getLong(r.fieldIndex("hi")))
        !(h < qlo || l > qhi) && !(l >= qlo && h <= qhi) // straddling cells only
      }.map(_.getLong(cs.head.fieldIndex("n"))).sum
    }
    def check(lo: String, hi: String): Unit = {
      val (l, h) = (ts(lo), ts(hi))
      val est = db.estimateRowsInRange("t", l, h)
      val exact = db.query("t", l, h).count()
      val bound = errBound(l, h)
      assert(math.abs(est - exact) <= bound + 1e-6,
        s"[$lo,$hi] est=$est exact=$exact bound=$bound")
    }
    check("2024-01-01 00:00:00", "2024-01-01 03:59:59") // full (exact, bound 0)
    check("2024-01-01 01:10:00", "2024-01-01 02:40:00") // straddles cells
    check("2024-01-01 00:30:00", "2024-01-01 00:31:00") // narrow
    val sel = db.estimateSelectivity("t", ts("2024-01-01 00:00:00"),
      ts("2024-01-01 03:59:59"))
    assert(math.abs(sel - 1.0) < 1e-9)

    // compact rewrites files but not rows: the histogram stays valid
    val estBefore = db.estimateRowsInRange("t",
      ts("2024-01-01 01:10:00"), ts("2024-01-01 02:40:00"))
    assert(db.compact("t") > 0)
    assert(db.estimateRowsInRange("t",
      ts("2024-01-01 01:10:00"), ts("2024-01-01 02:40:00")) === estBefore)

    // cleanup drops bucket 00 (ends 01:00 <= cutoff 01:30); its
    // histogram rows must go with it, keeping estimates exact-for-bound
    // over the survivors
    assert(db.cleanup("t", ts("2024-01-01 05:30:00")) === Seq("2024-01-01-00"))
    assert(db.colStats("t").filter(col("tbucket") === "2024-01-01-00").isEmpty)
    check("2024-01-01 00:00:00", "2024-01-01 03:59:59")

    // new data invalidates: estimates refuse to answer from a stale
    // histogram until the next rebuild
    db.insertSeq("t", Seq(row("fresh", "2024-01-01 03:30:00")), insertNow)
    assert(db.colStats("t").isEmpty)
    intercept[IllegalStateException](
      db.estimateRowsInRange("t", ts("2024-01-01 00:00:00"), ts("2024-01-01 04:00:00")))
    db.rebuildColStats("t", nHist = 8)
    check("2024-01-01 01:00:00", "2024-01-01 03:59:59")
    db.close()
  }

  test("empty table queries cleanly") {
    val db = freshDb()
    db.createTable("t")
    assert(db.query("t", ts("2024-01-01 00:00:00"),
      ts("2024-01-02 00:00:00")).count() === 0)
    assert(db.stats("t").numRows === 0)
  }

  test("rowIterator streams the range (dead RowIterator intent)") {
    val db = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 08:00:00"), row("b", "2024-01-01 09:00:00"),
      row("c", "2024-01-01 10:00:00")))
    val it = db.rowIterator("t", ts("2024-01-01 08:30:00"), ts("2024-01-01 10:00:00"))
    assert(it.map(_.key).toSeq.sorted === Seq("b", "c"))
  }

  test("cleanup/compact prune sidecars even when a crashed swap left the live dir aside") {
    import org.apache.spark.sql.functions.col
    // the guard-ordering bug: cleanup()'s Files.exists(statsPath) check
    // evaluated BEFORE recovery would skip the retention rewrite when a
    // crashed rewriteSidecar left the state in .old — the next read
    // would then recover a sidecar still counting the dropped buckets
    val root = Files.createTempDirectory("crashprune")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour",
      ttl = Some(4 * 3600L), compactFileThreshold = 2))
    db.createTable("t")
    val now = ts("2024-01-01 12:00:00")
    // insert the doomed bucket with an EARLY now — the insert-time TTL
    // gate would otherwise drop the rows before they ever land
    db.insertSeq("t", Seq(row("dead1", "2024-01-01 00:30:00"),
      row("dead2", "2024-01-01 00:40:00")), ts("2024-01-01 01:00:00"))
    db.insertSeq("t", Seq(row("live", "2024-01-01 11:30:00")), now)
    db.rebuildColStats("t", nHist = 4)
    // simulate the mid-swap crash: live dirs renamed aside, no .tmp
    Files.move(root.resolve("t/_stats"), root.resolve("t/_stats.old"))
    Files.move(root.resolve("t/_colstats"), root.resolve("t/_colstats.old"))
    val dropped = db.cleanup("t", now)
    assert(dropped === Seq("2024-01-01-00"))
    // the sketch sidecar was recovered AND pruned: the dropped bucket's
    // keys no longer count into range estimates
    assert(db.approxDistinctKeys("t",
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:59:59")) === 0L)
    assert(db.approxDistinctKeys("t",
      ts("2024-01-01 11:00:00"), ts("2024-01-01 11:59:59")) === 1L)
    // _colstats likewise: no row for the dropped bucket survives
    assert(db.colStats("t").filter(col("tbucket") === "2024-01-01-00").isEmpty)
    assert(!db.colStats("t").isEmpty)

    // compact has the same shape: fragment the live bucket, crash the
    // sidecar aside again, compact must recover-then-fold (not skip)
    db.insertSeq("t", Seq(row("live2", "2024-01-01 11:35:00")), now)
    db.insertSeq("t", Seq(row("live3", "2024-01-01 11:40:00")), now)
    Files.move(root.resolve("t/_stats"), root.resolve("t/_stats.old"))
    assert(db.compact("t") === 1)
    assert(Files.exists(root.resolve("t/_stats")) &&
      !Files.exists(root.resolve("t/_stats.old")))
    // folded to one sidecar row per bucket, all three live keys counted
    assert(spark.read.parquet(root.resolve("t/_stats").toString).count() === 1L)
    assert(db.approxDistinctKeys("t",
      ts("2024-01-01 11:00:00"), ts("2024-01-01 11:59:59")) === 3L)
    db.close()
  }

  test("sidecarsConsistent tolerates null keys (CMS skips them; anchor is count(key))") {
    val root = Files.createTempDirectory("nullkey")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour",
      sketchCmsDepth = 4, sketchCmsWidth = 64))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 08:10:00"),
      ChronoRow(null, ts("2024-01-01 08:20:00"), Array[Byte](1)),
      row("b", "2024-01-01 08:30:00")))
    // a null key increments no CMS cell but IS a data row; the check
    // must still hold (and stay repair-stable: rebuild changes nothing)
    assert(db.sidecarsConsistent("t"))
    db.rebuildSidecars("t")
    assert(db.sidecarsConsistent("t"))
    // an all-null-key bucket has zero CMS mass — also consistent
    db.insertSeq("t", Seq(
      ChronoRow(null, ts("2024-01-01 09:10:00"), Array[Byte](2))))
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  test("recoverSidecar clears a dead-end incomplete .tmp (pre-first-build state)") {
    val root = Files.createTempDirectory("deadend")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour"))
    db.createTable("t")
    // crash during the very first sidecar build: no live dir, no .old,
    // an incomplete .tmp (no _SUCCESS) — the read must return the
    // legitimate empty state AND remove the junk
    val tmp = root.resolve("t/_stats.tmp")
    Files.createDirectories(tmp)
    Files.write(tmp.resolve("part-junk.parquet"), Array[Byte](0, 1, 2))
    assert(db.sketchStats("t").isEmpty)
    assert(!Files.exists(tmp), "incomplete .tmp must not linger")
    db.close()
  }

  test("rangeJoinAdaptive: broadcast hint follows the _colstats estimate") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("adaptive")
    val db = new ChronoDB(spark, ChronoConfig(root.toString, bucket = "hour"))
    db.createTable("t")
    // 4 buckets × 30 rows; a one-bucket range estimates ~30 rows, the
    // full range ~120 — a threshold of 60 separates the two decisions
    db.insertSeq("t", (0 until 4).flatMap(h => (0 until 30).map(m =>
      row(s"k$h-$m", f"2024-01-01 $h%02d:${2 * m}%02d:00"))))
    db.rebuildColStats("t", nHist = 4)
    val other = spark.range(200).select(concat(lit("k"),
      (col("id") % 4).cast("string"), lit("-"),
      (col("id") % 30).cast("string")).as("key"), col("id").as("payload"))
    // kill every SIZE-based broadcast so the only broadcast left is the
    // estimate-driven hint under test
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqeThresh = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def planOf(start: String, end: String, threshold: Long): String = {
        val j = db.rangeJoinAdaptive("t", ts(start), ts(end), other,
          Seq("key"), broadcastRowThreshold = threshold)
        j.collect() // executed plan — AQE finalizes joins at runtime
        j.queryExecution.executedPlan.toString
      }
      // narrow range, estimate ≈ 30 ≤ 60 → hinted broadcast join
      val narrow = planOf("2024-01-01 01:00:00", "2024-01-01 01:59:59", 60L)
      assert(narrow.contains("BroadcastHashJoin"),
        s"estimate below threshold must broadcast the range scan:\n$narrow")
      // full range, estimate ≈ 120 > 60 → no hint, shuffle join
      val wide = planOf("2024-01-01 00:00:00", "2024-01-01 03:59:59", 60L)
      assert(!wide.contains("BroadcastHashJoin"),
        s"estimate above threshold must not broadcast:\n$wide")
      // no _colstats → honest fallback, un-hinted
      val db2root = Files.createTempDirectory("adaptive2")
      val db2 = new ChronoDB(spark, ChronoConfig(db2root.toString, bucket = "hour"))
      db2.createTable("t")
      db2.insertSeq("t", Seq(row("k0-0", "2024-01-01 00:00:30")))
      val j2 = db2.rangeJoinAdaptive("t", ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:59:59"), other, Seq("key"))
      j2.collect()
      assert(!j2.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      db2.close()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      prevAqeThresh match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("queryKey: bloom index prunes to the key's buckets at FILE granularity") {
    val dir = Files.createTempDirectory("bloomprune").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      compactFileThreshold = 2))
    db.createTable("t")
    // 6 hour-buckets, disjoint key sets; "needle" lives in hours 1 and 4
    db.insertSeq("t", (0 until 6).flatMap { h =>
      Seq(row(s"k$h-a", f"2024-01-01 0$h%01d:10:00"),
        row(s"k$h-b", f"2024-01-01 0$h%01d:20:00"))
    } ++ Seq(
      row("needle", "2024-01-01 01:30:00"),
      row("needle", "2024-01-01 04:30:00")))
    val root = java.nio.file.Paths.get(dir)
    def filesIn(bucket: String): Int = {
      val d = root.resolve("t").resolve(s"bucket=$bucket")
      if (!Files.isDirectory(d)) 0
      else { val s = Files.list(d)
        try s.filter(_.toString.endsWith(".parquet")).count().toInt
        finally s.close() }
    }
    val needleFiles = filesIn("2024-01-01-01") + filesIn("2024-01-01-04")
    val total = (0 until 6).map(h => filesIn(f"2024-01-01-0$h%01d")).sum
    assert(total > needleFiles) // non-vacuous
    val q = db.queryKey("t", "needle")
    val got = q.collect().map(_.getAs[Timestamp]("ts")).map(_.toString).sorted
    assert(got.toSeq === Seq("2024-01-01 01:30:00.0", "2024-01-01 04:30:00.0"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    // the reference's findBlockForKey (index.go:231-238) touches one
    // block; the bloom sidecar must do the same at file granularity —
    // nearly-empty 4096-capacity filters make a cross-bucket false
    // positive (the only legitimate over-read) essentially impossible
    assert(numFiles === needleFiles,
      s"queryKey read $numFiles files; only the $needleFiles in hours 01/04 hold the key")
    // a key nobody inserted prunes to an empty scan but a correct result
    assert(db.queryKey("t", "absent").count() === 0L)
    db.close()
  }

  test("queryKey: a sidecar coverage gap (insert crash window) is never pruned") {
    val dir = Files.createTempDirectory("bloomgap").toString
    val seed = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour"))
    seed.createTable("t")
    seed.insertSeq("t", Seq(row("a", "2024-01-01 00:15:00")))
    seed.close()
    // land data in hour 01 with NO sidecar rows at all — a config with
    // every sketch family disabled (the observe path the crash would
    // have interrupted simply never runs)
    val bare = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0))
    bare.insertSeq("t", Seq(row("ghost", "2024-01-01 01:15:00")))
    bare.close()
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour"))
    assert(db.sidecarCoverageGaps("t") === Seq("2024-01-01-01"))
    // the uncovered bucket's key must come back even though no bloom
    // ever saw it — gaps are unconditional candidates
    assert(db.queryKey("t", "ghost").count() === 1L)
    db.close()
  }

  test("queryKey: pre-bloom sidecar rows read as null and disable pruning, not results") {
    val dir = Files.createTempDirectory("prebloom").toString
    // batch 1 written WITHOUT the bloom family (an old-version sidecar:
    // rows exist, bloom column absent → null under the explicit schema)
    val old = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      sketchBloomKeys = 0))
    old.createTable("t")
    old.insertSeq("t", Seq(row("legacy", "2024-01-01 00:10:00")))
    old.close()
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour"))
    // batch 2 with blooms, same bucket: the fold null-poisons the
    // bucket's bloom (a filter missing batch-1 keys would mis-prune)
    db.insertSeq("t", Seq(row("fresh", "2024-01-01 00:40:00")))
    assert(db.queryKey("t", "legacy").count() === 1L)
    assert(db.queryKey("t", "fresh").count() === 1L)
    db.close()
  }

  test("queryKey: compact folds per-batch blooms losslessly (OR-merge)") {
    val db = freshDb()
    db.createTable("t")
    // 3 batches into ONE bucket → 3 sidecar rows, enough files to compact
    (1 to 3).foreach(i =>
      db.insertSeq("t", Seq(row(s"batch$i", s"2024-01-01 00:0$i:00"))))
    assert(db.compact("t") === 1)
    // after the fold there is one sidecar row per bucket, and every
    // batch's key still resolves (a lossy fold would drop batch keys)
    (1 to 3).foreach { i =>
      assert(db.queryKey("t", s"batch$i").count() === 1L, s"batch$i lost")
    }
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  test("queryKeyRange: key-interval pruning at file granularity; boundaries inclusive") {
    val dir = Files.createTempDirectory("keyrange").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      compactFileThreshold = 2))
    db.createTable("t")
    // key populations clustered per bucket: hour h holds tenant{h}/...
    db.insertSeq("t", (0 until 6).flatMap { h =>
      Seq(row(s"tenant$h/a", f"2024-01-01 0$h%01d:10:00"),
        row(s"tenant$h/b", f"2024-01-01 0$h%01d:20:00"))
    })
    val q = db.queryKeyRange("t", "tenant2/", "tenant2/\uffff")
    val got = q.collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("tenant2/a", "tenant2/b"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val numFiles = scans.map(_.metrics("numFiles").value).sum
    val root = java.nio.file.Paths.get(dir)
    def filesIn(bucket: String): Int = {
      val d = root.resolve("t").resolve(s"bucket=$bucket")
      if (!Files.isDirectory(d)) 0
      else { val s = Files.list(d)
        try s.filter(_.toString.endsWith(".parquet")).count().toInt
        finally s.close() }
    }
    assert(numFiles === filesIn("2024-01-01-02"),
      s"range scan read $numFiles files; only hour 02 overlaps the tenant2 interval")
    // inclusive on both ends: exact-key bounds return the boundary rows
    assert(db.queryKeyRange("t", "tenant3/a", "tenant4/a")
      .collect().map(_.getString(0)).sorted.toSeq ===
      Seq("tenant3/a", "tenant3/b", "tenant4/a"))
    // empty interval → empty result, not an error
    assert(db.queryKeyRange("t", "zz", "zzz").count() === 0L)
    db.close()
  }

  test("queryKeys: batch lookup prunes to the union of the keys' buckets") {
    val dir = Files.createTempDirectory("bloommulti").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      compactFileThreshold = 2))
    db.createTable("t")
    db.insertSeq("t", (0 until 6).flatMap { h =>
      Seq(row(s"k$h-a", f"2024-01-01 0$h%01d:10:00"),
        row(s"k$h-b", f"2024-01-01 0$h%01d:20:00"))
    })
    val q = db.queryKeys("t", Seq("k1-a", "k4-b", "k1-a")) // dup probe OK
    val got = q.collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("k1-a", "k4-b"))
    val numFiles = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.metrics("numFiles").value).sum
    val root = java.nio.file.Paths.get(dir)
    def filesIn(bucket: String): Int = {
      val d = root.resolve("t").resolve(s"bucket=$bucket")
      if (!Files.isDirectory(d)) 0
      else { val s = Files.list(d)
        try s.filter(_.toString.endsWith(".parquet")).count().toInt
        finally s.close() }
    }
    // ONE scan over exactly the union of the two keys' buckets
    assert(numFiles === filesIn("2024-01-01-01") + filesIn("2024-01-01-04"))
    assert(db.queryKeys("t", Seq.empty).count() === 0L)
    db.close()
  }

  test("deleteKey: rewrites only the key's buckets, rebuilds their sidecar rows") {
    val dir = Files.createTempDirectory("delkey").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      compactFileThreshold = 2))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("victim", "2024-01-01 00:10:00"),   // hour 00: victim + bystander
      row("stay0", "2024-01-01 00:20:00"),
      row("stay1", "2024-01-01 01:10:00"),    // hour 01: untouched
      row("victim", "2024-01-01 02:10:00")))  // hour 02: victim ONLY → emptied
    val root = java.nio.file.Paths.get(dir)
    def filesOf(bucket: String): Set[String] = {
      val d = root.resolve("t").resolve(s"bucket=$bucket")
      if (!Files.isDirectory(d)) Set.empty
      else { val s = Files.list(d)
        try { import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet }
        finally s.close() }
    }
    val untouchedBefore = filesOf("2024-01-01-01")
    assert(db.deleteKey("t", "victim") === 2L)
    // rows: victim gone, bystanders intact
    assert(db.table("t").select("key").as[String].collect().sorted.toSeq ===
      Seq("stay0", "stay1"))
    // hour 01's files are bit-identical (same names — never rewritten)
    assert(filesOf("2024-01-01-01") === untouchedBefore)
    // hour 02 lost its only rows → partition dir dropped entirely
    assert(filesOf("2024-01-01-02").isEmpty)
    // sidecar rebuilt from survivors: consistent, and the rebuilt bloom
    // no longer claims the victim — the point lookup prunes to nothing
    assert(db.sidecarsConsistent("t"))
    assert(db.queryKey("t", "victim").count() === 0L)
    assert(db.queryKey("t", "stay0").count() === 1L)
    // deleting an absent key is a no-op reporting 0
    assert(db.deleteKey("t", "nobody") === 0L)
    db.close()
  }

  test("deleteKeys: one pass removes a key batch, keeps null-key rows") {
    val dir = Files.createTempDirectory("delkeys").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour"))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 00:10:00"),
      row("b", "2024-01-01 00:20:00"),       // same bucket as a
      row("keep", "2024-01-01 00:30:00"),
      row(null, "2024-01-01 00:40:00"),      // null key must survive
      row("b", "2024-01-01 01:10:00"),       // b spans two buckets
      row("only", "2024-01-01 02:10:00")))   // emptied bucket case
    assert(db.deleteKeys("t", Seq("a", "b", "only", "absent", "b")) === 4L)
    assert(db.table("t").select("key").as[String].collect().sorted(
      Ordering[String].on[String](s => if (s == null) "" else s)).toSeq
      === Seq(null, "keep"))
    assert(db.sidecarsConsistent("t"))
    assert(db.queryKeys("t", Seq("a", "b", "only")).count() === 0L)
    assert(db.queryKey("t", "keep").count() === 1L)
    // empty batch is a no-op
    assert(db.deleteKeys("t", Seq.empty) === 0L)
    db.close()
  }

  test("queryKey: correct with the bloom family disabled (no pruning path)") {
    val dir = Files.createTempDirectory("nobloom").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      sketchBloomKeys = 0))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("x", "2024-01-01 00:10:00"), row("y", "2024-01-01 01:10:00")))
    assert(db.queryKey("t", "x").count() === 1L)
    assert(db.queryKey("t", "nope").count() === 0L)
    db.close()
    db.close()
  }

  test("queryDeduped keeps latest row per key (PrimaryKeys intent)") {
    val db = freshDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("k", "2024-01-01 08:00:00", "old"),
      row("k", "2024-01-01 09:00:00", "new"),
      row("j", "2024-01-01 08:30:00", "only")))
    val out = db.queryDeduped("t", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
      .collect().map(r => r.getString(0) -> new String(r.getAs[Array[Byte]]("data"), "UTF-8")).toMap
    assert(out === Map("k" -> "new", "j" -> "only"))
  }

  // --- _rollup continuous aggregate ---

  private def rollupDb(): ChronoDB = {
    val dir = Files.createTempDirectory("chronodb_rollup").toString
    new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      compactFileThreshold = 2,
      rollupValue = Some("decode(data, 'UTF-8')")))
  }

  private def slots(db: ChronoDB, name: String,
      lo: String, hi: String): Map[Timestamp, (Long, Long, Long, Option[Long], Option[Long])] =
    db.rollupRange(name, ts(lo), ts(hi)).collect().map { r =>
      r.getTimestamp(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toMap

  test("rollup: insert maintains per-hour slots; multi-batch rows fold losslessly") {
    val db = rollupDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:05:00", "3"),
      row("b", "2024-01-01 10:50:00", "7"),
      row("c", "2024-01-01 11:00:00", "10")))
    db.insertSeq("t", Seq( // second batch, same 10:00 slot
      row("d", "2024-01-01 10:20:00", "5")))
    val got = slots(db, "t", "2024-01-01 10:00:00", "2024-01-01 12:00:00")
    assert(got === Map(
      ts("2024-01-01 10:00:00") -> (3L, 3L, 15L, Some(3L), Some(7L)),
      ts("2024-01-01 11:00:00") -> (1L, 1L, 10L, Some(10L), Some(10L))))
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  test("rollup: un-castable data counts into n but not nv/sum (null value)") {
    val db = rollupDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:05:00", "3"),
      row("b", "2024-01-01 10:06:00", "not-a-number")))
    val got = slots(db, "t", "2024-01-01 10:00:00", "2024-01-01 11:00:00")
    assert(got === Map(ts("2024-01-01 10:00:00") -> (2L, 1L, 3L, Some(3L), Some(3L))))
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  test("rollup: compact folds batch rows; answers survive unchanged") {
    val db = rollupDb()
    db.createTable("t")
    (1 to 4).foreach(i => db.insertSeq("t",
      Seq(row("k" + i, "2024-01-01 10:00:0" + i, i.toString))))
    val before = slots(db, "t", "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    assert(db.compact("t") === 1)
    val after = slots(db, "t", "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    assert(before === after)
    assert(before(ts("2024-01-01 10:00:00")) === (4L, 4L, 10L, Some(1L), Some(4L)))
    db.close()
  }

  test("rollup: deleteKeys re-aggregates touched buckets from survivors") {
    val db = rollupDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("gone", "2024-01-01 10:05:00", "100"),
      row("kept", "2024-01-01 10:10:00", "1"),
      row("gone", "2024-01-02 09:00:00", "200"), // whole bucket emptied
      row("also", "2024-01-03 08:00:00", "9")))
    assert(db.deleteKeys("t", Seq("gone")) === 2L)
    val got = slots(db, "t", "2024-01-01 00:00:00", "2024-01-04 00:00:00")
    assert(got === Map(
      ts("2024-01-01 10:00:00") -> (1L, 1L, 1L, Some(1L), Some(1L)),
      ts("2024-01-03 08:00:00") -> (1L, 1L, 9L, Some(9L), Some(9L))))
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  test("upsert replaces every batch key's rows, keeps bystanders, inserts new keys") {
    val dir = Files.createTempDirectory("chronodb_upsert").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day"))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:00:00", "v1"),
      row("a", "2024-01-02 10:00:00", "v2"), // both a-rows must go
      row("b", "2024-01-01 11:00:00", "keep")))
    val removed = db.upsert("t", spark.createDataset(Seq(
      row("a", "2024-01-05 09:00:00", "v3"),
      row("c", "2024-01-05 09:30:00", "new"))))
    assert(removed === 2L)
    val got = db.query("t", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"))
      .collect().map(r => (r.getString(0),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).sorted.toSeq
    assert(got === Seq(("a", "v3"), ("b", "keep"), ("c", "new")))
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  private def realtimeSlots(db: ChronoDB, name: String,
      lo: String, hi: String): Map[Timestamp, (Long, Long, Long, Option[Long], Option[Long])] =
    db.rollupRangeRealtime(name, ts(lo), ts(hi)).collect().map { r =>
      r.getTimestamp(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toMap

  test("rollup realtime: unaligned edges are range-exact, interior from sidecar") {
    val db = rollupDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 09:50:00", "1"),   // leading slot, OUT of range
      row("b", "2024-01-01 09:59:00", "2"),   // leading slot, in range
      row("c", "2024-01-01 10:30:00", "4"),   // interior slot
      row("d", "2024-01-01 11:10:00", "8"),   // trailing slot, in range
      row("e", "2024-01-01 11:40:00", "16"))) // trailing slot, OUT of range
    val got = realtimeSlots(db, "t",
      "2024-01-01 09:55:00", "2024-01-01 11:20:00")
    assert(got === Map(
      ts("2024-01-01 09:00:00") -> (1L, 1L, 2L, Some(2L), Some(2L)),
      ts("2024-01-01 10:00:00") -> (1L, 1L, 4L, Some(4L), Some(4L)),
      ts("2024-01-01 11:00:00") -> (1L, 1L, 8L, Some(8L), Some(8L))))
    // slot-granular rollupRange would include ALL five rows
    assert(slots(db, "t", "2024-01-01 09:55:00", "2024-01-01 11:20:00")
      .values.map(_._1).sum === 5L)
    db.close()
  }

  test("rollup realtime: aligned range ≡ rollupRange; sub-slot range works") {
    val db = rollupDb()
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:05:00", "3"),
      row("b", "2024-01-01 10:50:00", "7"),
      row("c", "2024-01-01 11:00:00", "10")))
    // aligned: [10:00, 11:59:59.999999] covers slots 10 and 11 exactly
    assert(realtimeSlots(db, "t", "2024-01-01 10:00:00", "2024-01-01 11:59:59.999999")
      === slots(db, "t", "2024-01-01 10:00:00", "2024-01-01 11:59:59.999999"))
    // sub-slot: both bounds inside slot 10 — single clipped data scan
    assert(realtimeSlots(db, "t", "2024-01-01 10:10:00", "2024-01-01 10:55:00")
      === Map(ts("2024-01-01 10:00:00") -> (1L, 1L, 7L, Some(7L), Some(7L))))
    db.close()
  }

  test("rollup realtime: missing sidecar falls back to data, stays exact") {
    val dir = Files.createTempDirectory("chronodb_rt_nofile").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      rollupValue = Some("decode(data, 'UTF-8')")))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:05:00", "3"),
      row("b", "2024-01-01 11:20:00", "5")))
    val expect = realtimeSlots(db, "t",
      "2024-01-01 09:30:00", "2024-01-01 12:30:00")
    // simulate the crash window: sidecar gone, data intact
    val side = java.nio.file.Paths.get(dir, "t", "_rollup")
    import scala.jdk.CollectionConverters._
    Files.walk(side).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    assert(realtimeSlots(db, "t",
      "2024-01-01 09:30:00", "2024-01-01 12:30:00") === expect)
    db.close()
  }

  test("rollup: retention drops slots with their buckets") {
    val dir = Files.createTempDirectory("chronodb_rollup_ttl").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      ttl = Some(3L * 86400),
      rollupValue = Some("decode(data, 'UTF-8')")))
    db.createTable("t")
    // insert "at" Jan 7 so the TTL insert-gate keeps both rows; by the
    // cleanup's `now` the 01-06 bucket has wholly expired
    db.insert("t", spark.createDataset(Seq(
      row("old", "2024-01-06 10:00:00", "5"),
      row("new", "2024-01-09 10:00:00", "7"))), ts("2024-01-07 12:00:00"))
    assert(db.cleanup("t", ts("2024-01-10 12:00:00")) === Seq("2024-01-06"))
    val got = slots(db, "t", "2024-01-01 00:00:00", "2024-01-10 00:00:00")
    assert(got === Map(ts("2024-01-09 10:00:00") -> (1L, 1L, 7L, Some(7L), Some(7L))))
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  test("deleteMatching: 100k-key batch rides the broadcast-join path") {
    val dir = Files.createTempDirectory("chronodb_bigdel").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour"))
    db.createTable("t")
    import org.apache.spark.sql.functions._
    // 120k rows across 3 hourly buckets (2024-01-01 10:00/11:00/12:00 UTC)
    val rows = spark.range(120000).select(
      format_string("k%06d", col("id")).as("key"),
      expr("timestamp_micros(1704103200000000L + (id % 3) * 3600000000L)")
        .as("ts"),
      lit("x".getBytes("UTF-8")).as("data")).as[ChronoRow]
    db.insert("t", rows)
    // 100k doomed keys — far past literalKeyLimit, so this MUST take the
    // keys-DataFrame join path (no driver collect, no isin literal)
    val doomed = spark.range(100000)
      .select(format_string("k%06d", col("id")).as("key"))
    assert(db.deleteMatching("t", doomed) === 100000L)
    assert(db.table("t").count() === 20000L)
    // same sidecar-consistency contract as the literal path
    assert(db.sidecarsConsistent("t"))
    assert(db.queryKey("t", "k000000").count() === 0L)
    assert(db.queryKey("t", "k119999").count() === 1L)
    // a >limit Seq to deleteKeys routes through the same path; the
    // 20k survivors all match → every bucket empties
    assert(db.deleteKeys("t",
      (100000 until 120000).map(i => f"k$i%06d")) === 20000L)
    assert(db.table("t").count() === 0L)
    db.close()
  }

  test("deleteMatching: clustered large batch touches only its own buckets (per-bucket envelopes)") {
    // 5 day-buckets with DISJOINT key populations (u1_* .. u5_*); the
    // doomed batch is every key of buckets 1 and 5 — 24k keys, past
    // literalKeyLimit, clustered at BOTH ends of the key space. The
    // GLOBAL envelope [u1_00000, u5_11999] covers all five buckets; the
    // per-bucket envelope check must keep only 1 and 5, so every table
    // scan the delete runs (hit counting, the rewrite, sidecar repair)
    // stays inside those two buckets' files — asserted from the scans'
    // numFiles metrics via a QueryExecutionListener, plus untouched
    // mtimes on buckets 2-4.
    val dir = Files.createTempDirectory("chronodb_envdel").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day"))
    db.createTable("t")
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val rows = spark.range(60000).select(
      format_string("u%d_%05d", col("id") % 5 + 1,
        (col("id") / 5).cast("long")).as("key"),
      expr("timestamp_micros(1704067200000000L + ((id % 5) * 86400000000L))")
        .as("ts"),
      lit("x".getBytes("UTF-8")).as("data")).as[ChronoRow]
    db.insert("t", rows)
    val root = java.nio.file.Paths.get(dir).resolve("t")
    def bucketFiles(day: Int): Map[String, java.nio.file.attribute.FileTime] = {
      val d = root.resolve(f"bucket=2024-01-0$day%d")
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p))
        .toMap
      finally s.close()
    }
    val untouchedBefore = (2 to 4).map(bucketFiles)
    val ownFiles = bucketFiles(1).size + bucketFiles(5).size
    val scanFiles = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      // AQE hides its finalized subtree behind leaf nodes
      // (AdaptiveSparkPlanExec / QueryStageExec / ReusedExchangeExec),
      // so a plain TreeNode.collect never reaches the scans — unwrap
      // each explicitly
      private def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit =
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
            walk(r.child)
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            if (s.relation.location.rootPaths
                .exists(_.toString.contains("chronodb_envdel")))
              scanFiles.add(s.metrics("numFiles").value)
          case other => other.children.foreach(walk)
        }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = walk(qe.executedPlan)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val doomed = spark.range(24000).select(
        format_string("u%d_%05d", when(col("id") < 12000, 1).otherwise(5),
          col("id") % 12000).as("key"))
      assert(db.deleteMatching("t", doomed) === 24000L)
      // listener events are async — wait until the scan count stabilizes
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(150)
        val n = scanFiles.size()
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.listenerManager.unregister(listener)
    assert(!scanFiles.isEmpty, "no table scans observed by the listener")
    scanFiles.asScala.foreach { n =>
      assert(n <= ownFiles,
        s"a delete-path scan read $n files; buckets 1+5 only hold $ownFiles")
    }
    assert((2 to 4).map(bucketFiles) === untouchedBefore,
      "buckets outside the batch's envelopes were rewritten")
    assert(db.table("t").count() === 36000L)
    assert(db.queryKey("t", "u1_00000").count() === 0L)
    assert(db.queryKey("t", "u3_00000").count() === 1L)
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  test("deleteMatching: small key set falls back to the Bloom literal path") {
    val dir = Files.createTempDirectory("chronodb_smalldel").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour"))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 00:10:00"),
      row("b", "2024-01-01 00:20:00"),
      row("keep", "2024-01-01 01:30:00")))
    assert(db.deleteMatching("t", Seq("a", "b", "absent").toDF("key")) === 2L)
    assert(db.table("t").select("key").as[String].collect().toSeq === Seq("keep"))
    assert(db.sidecarsConsistent("t"))
    // empty / all-null key frames are no-ops
    assert(db.deleteMatching("t", Seq.empty[String].toDF("key")) === 0L)
    db.close()
  }

  test("upsert: TTL-expired change rows neither delete nor insert (no silent erasure)") {
    val dir = Files.createTempDirectory("chronodb_upsert_ttl").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      ttl = Some(3L * 86400)))
    db.createTable("t")
    val now = ts("2024-01-10 00:00:00")
    db.insert("t", spark.createDataset(Seq(
      row("a", "2024-01-09 10:00:00", "live"))), now)
    // the change row for `a` is already past TTL at `now` — deleting its
    // live rows while insert drops the replacement would silently erase
    // the key; the TTL gate must run BEFORE the key set is derived
    val removed = db.upsert("t", spark.createDataset(Seq(
      row("a", "2024-01-02 00:00:00", "stale"),
      row("b", "2024-01-09 11:00:00", "new"))), now)
    assert(removed === 0L)
    val got = db.query("t", ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"))
      .collect().map(r => (r.getString(0),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).sorted.toSeq
    assert(got === Seq(("a", "live"), ("b", "new")))
    assert(db.sidecarsConsistent("t"))
    db.close()
  }

  test("rollup: consistency detects a data-without-rollup gap; rebuild repairs") {
    val dir = Files.createTempDirectory("chronodb_rollup_gap").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      rollupValue = Some("decode(data, 'UTF-8')")))
    db.createTable("t")
    db.insertSeq("t", Seq(row("a", "2024-01-01 10:00:00", "3")))
    assert(db.sidecarsConsistent("t"))
    // simulate the crash window: data landed, rollup row lost
    val p = java.nio.file.Paths.get(dir, "t", "_rollup")
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(Files.delete(_))
    finally s.close()
    assert(!db.sidecarsConsistent("t"))
    db.rebuildSidecars("t")
    assert(db.sidecarsConsistent("t"))
    assert(slots(db, "t", "2024-01-01 00:00:00", "2024-01-02 00:00:00") ===
      Map(ts("2024-01-01 10:00:00") -> (1L, 1L, 3L, Some(3L), Some(3L))))
    db.close()
  }

  test("config presets: smallBatch is bloom-only, fullStats keeps every family") {
    val sb = ChronoConfig.smallBatch("x")
    assert(sb.sketchLgK === 0 && sb.sketchCmsDepth === 0)
    assert(sb.sketchBloomKeys > 0, "the preset must keep the key index on")
    val fs = ChronoConfig.fullStats("x")
    assert(fs.sketchLgK > 0 && fs.sketchCmsDepth > 0 && fs.sketchBloomKeys > 0)

    // smallBatch still answers key lookups with pruning (bloom + min/max
    // land in the sidecar) but writes no HLL: sketchStats is empty
    val dir = Files.createTempDirectory("preset").toString
    val db = new ChronoDB(spark, ChronoConfig.smallBatch(dir))
    db.createTable("t")
    db.insertSeq("t", Seq(
      row("a", "2024-01-01 10:00:00"), row("b", "2024-01-01 11:00:00")))
    assert(db.queryKey("t", "a").count() === 1)
    assert(db.queryKey("t", "nope").count() === 0)
    assert(db.sketchStats("t").count() === 0)
    db.close()
  }
}
