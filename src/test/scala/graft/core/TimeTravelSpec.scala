package graft.core

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSuite

/** Snapshot versioning + time travel (`_history` commit log,
  * [[ChronoHistory]]): every manifest-changing verb records its
  * file-set delta; `tableAsOf` / `VERSION AS OF` / `TIMESTAMP AS OF`
  * reconstruct and read any retained version; readability is bounded
  * by the `trashGraceMs` retention horizon (vacuum prunes both files
  * and log); snapshots are read-only on every mutating surface. */
class TimeTravelSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mk(graceMs: Long = 3600000L, foldFiles: Int = 64)
      : (ChronoDB, String) = {
    val dir = Files.createTempDirectory("ttravel").toString
    (new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      writersPerBucket = 1, compactFileThreshold = 2,
      manifestFoldFiles = foldFiles,
      trashGraceMs = graceMs)), dir)
  }

  private def keysAt(db: ChronoDB, v: Long): Set[String] = {
    import org.apache.spark.sql.functions.col
    db.tableAsOf("t", v).select(col("key"))
      .collect().map(_.getString(0)).toSet
  }

  test("every verb commits a version; tableAsOf reconstructs each state") {
    val (db, _) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1)),
        ChronoRow("b", ts("2024-03-02 10:00:00"), Array(2))))   // v1
      db.insertSeq("t", Seq(ChronoRow("c", ts("2024-03-03 10:00:00"), Array(3)))) // v2
      db.deleteKeys("t", Seq("a"))                               // v3
      db.updateWhere("t", Seq("data" ->
        org.apache.spark.sql.functions.lit(Array[Byte](9))),
        org.apache.spark.sql.functions.col("key") === "b")       // v4
      val h = db.history("t")
      assert(h.map(_.verb) === Seq("update", "delete", "insert", "insert",
        "baseline"))
      assert(h.map(_.version) === Seq(4L, 3L, 2L, 1L, 0L))
      assert(keysAt(db, 0) === Set.empty[String])               // baseline: empty
      assert(keysAt(db, 1) === Set("a", "b"))
      assert(keysAt(db, 2) === Set("a", "b", "c"))
      assert(keysAt(db, 3) === Set("b", "c"))
      assert(keysAt(db, 4) === Set("b", "c"))
      // v4 content: b's payload updated — and the LIVE table matches v4
      import org.apache.spark.sql.functions.col
      val bData = db.tableAsOf("t", 4).filter(col("key") === "b")
        .head().getAs[Array[Byte]]("data")
      assert(bData.toSeq === Seq(9.toByte))
      assert(db.table("t").count() === db.tableAsOf("t", 4).count())
      // delta sizes recorded honestly: the delete rewrote 1 bucket
      val del = h.find(_.verb == "delete").get
      assert(del.removes.size === 1 && del.adds.isEmpty) // bucket emptied
    } finally db.close()
  }

  test("compact under grace: pre-compact version still readable; after vacuum it fails loudly") {
    val (db, _) = mk(graceMs = 400)
    try {
      db.createTable("t")
      (0 until 3).foreach { i =>
        db.insertSeq("t", Seq(ChronoRow(s"k$i",
          ts(f"2024-03-01 1$i:00:00"), Array(i.toByte))))
      }                                         // v1..v3, 3 files one bucket
      assert(db.compact("t") === 1)             // v4
      val h = db.history("t")
      assert(h.head.verb === "compact")
      assert(h.head.adds.size === 1 && h.head.removes.size === 3)
      // pre-compact snapshot reads the retained superseded files
      assert(keysAt(db, 3) === Set("k0", "k1", "k2"))
      assert(db.tableAsOf("t", 3).inputFiles.length === 3)
      assert(db.tableAsOf("t", 4).inputFiles.length === 1)
      Thread.sleep(600)
      assert(db.vacuumOrphans("t") === 3)
      // v3's files are gone — loud failure, not FileNotFound mid-query
      val e = intercept[Exception] { db.tableAsOf("t", 3).collect() }
      assert(e.getMessage.contains("no longer readable") ||
        e.getMessage.contains("no retained checkpoint"))
      // the current version still reads
      assert(keysAt(db, 4) === Set("k0", "k1", "k2"))
    } finally db.close()
  }

  test("row-level DML under grace keeps pre-mutation snapshots readable (uniform grace)") {
    val (db, dir) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1)),
        ChronoRow("b", ts("2024-03-01 11:00:00"), Array(2)),
        ChronoRow("c", ts("2024-03-02 10:00:00"), Array(3))))   // v1
      val preFiles = graft.sources.ChronoLayout
        .listEntries(Paths.get(dir, "t")).map(_.file).toSet
      assert(db.deleteKeys("t", Seq("a")) === 1L)               // v2: rewrite 03-01
      assert(db.deleteKeys("t", Seq("c")) === 1L)               // v3: empty 03-02
      // superseded files are RETAINED on disk (grace), not overwritten
      val postFiles = graft.sources.ChronoLayout
        .listEntries(Paths.get(dir, "t")).map(_.file).toSet
      assert(preFiles.subsetOf(postFiles))
      assert(keysAt(db, 1) === Set("a", "b", "c"))
      assert(keysAt(db, 2) === Set("b", "c"))
      assert(keysAt(db, 3) === Set("b"))
      assert(db.table("t").count() === 1L)
      assert(db.manifestConsistent("t"))
      assert(db.sidecarsConsistent("t"))
      // a reader that PLANNED pre-delete collects its snapshot
      val planned = db.tableAsOf("t", 1)
      db.updateWhere("t", Seq("data" ->
        org.apache.spark.sql.functions.lit(Array[Byte](7))),
        org.apache.spark.sql.functions.col("key") === "b")      // v4
      assert(planned.count() === 3L)
    } finally db.close()
  }

  test("timestamp resolution: last version at or before the instant") {
    val (db, _) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1))))
      Thread.sleep(20)
      db.insertSeq("t", Seq(ChronoRow("b", ts("2024-03-02 10:00:00"), Array(2))))
      val h = db.history("t")
      val (e1, e2) = (h.find(_.version == 1).get.epochMs,
        h.find(_.version == 2).get.epochMs)
      assert(e2 > e1)
      // between the two commits → v1; at/after the second → v2
      val mid = new Timestamp((e1 + e2) / 2)
      assert(db.tableAsOfTimestamp("t", mid).count() === 1L)
      assert(db.tableAsOfTimestamp("t",
        new Timestamp(e2)).count() === 2L)
      // before history begins → loud error
      val e = intercept[IllegalArgumentException] {
        db.tableAsOfTimestamp("t", new Timestamp(e1 - 3600000L))
      }
      assert(e.getMessage.contains("before"))
    } finally db.close()
  }

  test("checkpoint replay: snapshots correct across the fold cadence; old log prunes at vacuum") {
    val (db, dir) = mk(graceMs = 400, foldFiles = 4)
    try {
      db.createTable("t")
      (1 to 10).foreach { i =>
        db.insertSeq("t", Seq(ChronoRow(f"k$i%02d",
          ts(f"2024-03-${i}%02d 10:00:00"), Array(i.toByte))))
      } // v1..v10, checkpoints at v4 and v8
      val hdir = Paths.get(dir, "t", "_history")
      assert(Files.exists(hdir.resolve("4.checkpoint")))
      assert(Files.exists(hdir.resolve("8.checkpoint")))
      (1 to 10).foreach { v =>
        assert(db.tableAsOf("t", v).count() === v.toLong, s"version $v")
      }
      Thread.sleep(600)
      // log retention = max(horizon, grace); pass the short horizon so
      // the sweep runs (all data files are manifest-recorded → safe)
      db.vacuumOrphans("t", horizonMs = 400)
      // all commits' epochs are now past the grace: the log prunes to
      // the newest reconstruction base; head still reads
      assert(!Files.exists(hdir.resolve("1.commit")))
      assert(db.tableAsOf("t", 10).count() === 10L)
      // inserts never trash files, so even PRUNED versions' files are
      // still live-on-disk — but their commits are gone: loud error
      val e = intercept[Exception] { db.tableAsOf("t", 1) }
      assert(e.getMessage.contains("no retained checkpoint") ||
        e.getMessage.contains("out of range"))
    } finally db.close()
  }

  test("history adoption on a pre-history table: baseline checkpoint captures found state") {
    val (db, dir) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1))))
      // simulate a table written before history existed
      val hdir = Paths.get(dir, "t", "_history")
      Files.walk(hdir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      db.insertSeq("t", Seq(ChronoRow("b", ts("2024-03-02 10:00:00"), Array(2))))
      val h = db.history("t")
      assert(h.map(_.verb) === Seq("insert", "baseline"))
      assert(keysAt(db, 0) === Set("a"))   // the state adoption found
      assert(keysAt(db, 1) === Set("a", "b"))
    } finally db.close()
  }

  test("changesBetween: bag-correct row diff, updates as delete+insert pairs, only changed files read") {
    import org.apache.spark.sql.functions.{col, lit}
    val (db, _) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1)),
        ChronoRow("b", ts("2024-03-01 11:00:00"), Array(2)),
        ChronoRow("b", ts("2024-03-01 11:00:00"), Array(2)),  // duplicate row
        ChronoRow("c", ts("2024-03-02 10:00:00"), Array(3)))) // v1
      db.deleteKeys("t", Seq("a"))                             // v2
      db.updateWhere("t", Seq("data" -> lit(Array[Byte](9))),
        col("key") === "b")                                    // v3
      def changes(f: Long, t: Long): Seq[(String, String, Int)] =
        db.changesBetween("t", f, t)
          .select(col("key"), col("_change_type"), col("data"))
          .collect()
          .map(r => (r.getString(0), r.getString(1),
            r.getAs[Array[Byte]](2)(0).toInt))
          .sortBy(x => (x._1, x._2, x._3)).toSeq
      // v0→v1: every insert, with duplicate multiplicity preserved
      assert(changes(0, 1) === Seq(("a", "insert", 1), ("b", "insert", 2),
        ("b", "insert", 2), ("c", "insert", 3)))
      // v1→v2: just the delete — bucket bystanders (the b rows) net out
      assert(changes(1, 2) === Seq(("a", "delete", 1)))
      // v2→v3: the update as delete+insert pairs, ×2 (duplicate rows)
      assert(changes(2, 3) === Seq(("b", "delete", 2), ("b", "delete", 2),
        ("b", "insert", 9), ("b", "insert", 9)))
      // composite v1→v3
      assert(changes(1, 3) === Seq(("a", "delete", 1), ("b", "delete", 2),
        ("b", "delete", 2), ("b", "insert", 9), ("b", "insert", 9)))
      // identical versions → empty
      assert(db.changesBetween("t", 3, 3).isEmpty)
      // only CHANGED files are read: c's bucket never entered any diff
      assert(!db.changesBetween("t", 1, 3).inputFiles
        .exists(_.contains("bucket=2024-03-02")))
    } finally db.close()
  }

  test("path-connector time travel: versionAsOf / timestampAsOf options") {
    val (db, dir) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1)),
        ChronoRow("b", ts("2024-03-02 10:00:00"), Array(2))))   // v1
      db.deleteKeys("t", Seq("a"))                               // v2
      def read(opts: (String, String)*) = {
        val r = spark.read.format("chrono")
        opts.foreach { case (k, v) => r.option(k, v) }
        r.load(s"$dir/t")
      }
      assert(read("versionAsOf" -> "1").count() === 2L)
      assert(read("versionAsOf" -> "2").count() === 1L)
      assert(read().count() === 1L)
      // timestampAsOf: epoch millis of v1's commit resolves to v1
      val e1 = db.history("t").find(_.version == 1).get.epochMs
      assert(read("timestampAsOf" -> e1.toString).count() === 2L)
      intercept[IllegalArgumentException] {
        read("versionAsOf" -> "1", "timestampAsOf" -> e1.toString).count()
      }
    } finally db.close()
  }

  test("restoreVersion: undo, redo, linear history, sidecars consistent") {
    import org.apache.spark.sql.functions.col
    val (db, _) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1)),
        ChronoRow("b", ts("2024-03-02 10:00:00"), Array(2))))   // v1
      db.insertSeq("t", Seq(
        ChronoRow("c", ts("2024-03-03 10:00:00"), Array(3))))   // v2
      db.deleteKeys("t", Seq("a"))                               // v3
      def keys(): Set[String] =
        db.table("t").select(col("key")).collect().map(_.getString(0)).toSet
      assert(keys() === Set("b", "c"))
      // UNDO the delete: restore to v2 (v4)
      assert(db.restoreVersion("t", 2) > 0)
      assert(keys() === Set("a", "b", "c"))
      assert(db.manifestConsistent("t") && db.sidecarsConsistent("t"))
      // keyed reads serve the restored state (sidecars rebuilt)
      assert(db.queryKey("t", "a").count() === 1L)
      // REDO: restore forward to v3 (v5) — linear history, no branch
      assert(db.restoreVersion("t", 3) > 0)
      assert(keys() === Set("b", "c"))
      val h = db.history("t")
      assert(h.map(_.verb).take(2) === Seq("restore", "restore"))
      assert(h.map(_.version).take(2) === Seq(5L, 4L))
      // restore to the CURRENT state is a no-op
      assert(db.restoreVersion("t", 5) === 0)
      // deep undo to v1 still works (grace retains everything in-test)
      db.restoreVersion("t", 1)
      assert(keys() === Set("a", "b"))
      assert(db.manifestConsistent("t") && db.sidecarsConsistent("t"))
    } finally db.close()
  }

  test("restore via SQL procedure: CALL system.restore_version") {
    val dir = Files.createTempDirectory("ttravel").toString
    val cat = s"ttcat${System.nanoTime() % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.dataDir", dir)
    spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
    spark.conf.set(s"spark.sql.catalog.$cat.trashGrace", "1h")
    try {
      spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, data BINARY)")
      spark.sql(s"INSERT INTO $cat.ev VALUES " +
        "('a', TIMESTAMP '2024-01-01 10:00:00', X'01', '2024-01-01')")
      spark.sql(s"INSERT INTO $cat.ev VALUES " +
        "('b', TIMESTAMP '2024-01-02 10:00:00', X'02', '2024-01-02')")
      val n = spark.sql(s"CALL $cat.system.restore_version('ev', 1)")
        .head().getLong(0)
      assert(n === 1L)
      assert(spark.sql(s"SELECT key FROM $cat.ev").collect()
        .map(_.getString(0)).toSeq === Seq("a"))
      // the restore is itself a commit
      assert(spark.sql(s"CALL $cat.system.history('ev')")
        .head().getString(2) === "restore")
    } finally Seq("", ".dataDir", ".bucket", ".trashGrace")
      .foreach(s => spark.conf.unset(s"spark.sql.catalog.$cat$s"))
  }

  test("cross-bucket ts move records the paired '<verb>-move' commit; mid-verb state is an honest version") {
    import org.apache.spark.sql.functions.{col, lit}
    val (db, _) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1)),
        ChronoRow("b", ts("2024-03-01 11:00:00"), Array(2))))   // v1
      // move a's row into a bucket OUTSIDE the affected set: the verb
      // lands as TWO manifest mutations — the rewrite (v2) and the
      // re-route insert (v3), labeled as a pair
      db.updateWhere("t",
        Seq("ts" -> lit(ts("2024-03-05 10:00:00"))), col("key") === "a")
      val h = db.history("t")
      assert(h.map(_.verb) === Seq("update-move", "update", "insert",
        "baseline"))
      // the mid-verb version is exactly the state a crash between the
      // two mutations would leave: a's row in NEITHER bucket yet
      assert(db.tableAsOf("t", 2).count() === 1L)
      assert(db.tableAsOf("t", 3).count() === 2L)
      assert(db.table("t").filter(col("key") === "a")
        .head().getTimestamp(1) === ts("2024-03-05 10:00:00"))
    } finally db.close()
  }

  test("rebuildManifest records a checkpoint commit (resync point)") {
    val (db, _) = mk()
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1))))
      db.rebuildManifest("t")
      val h = db.history("t")
      assert(h.head.verb === "rebuild")
      assert(keysAt(db, h.head.version) === Set("a"))
    } finally db.close()
  }

  test("history=false writes mark the log STALE; the next recorded verb resyncs before its delta (no silent snapshot gap)") {
    val dir = Files.createTempDirectory("ttravel_stale").toString
    val cfg = ChronoConfig(dir, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      trashGraceMs = 3600000L)
    val db1 = new ChronoDB(spark, cfg)
    try {
      db1.createTable("t")
      db1.insertSeq("t",
        Seq(ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1))))  // v1
    } finally db1.close()
    // unrecorded write through a history=false handle
    val db2 = new ChronoDB(spark, cfg.copy(history = false))
    try db2.insertSeq("t",
      Seq(ChronoRow("b", ts("2024-03-02 10:00:00"), Array(2))))
    finally db2.close()
    val db3 = new ChronoDB(spark, cfg)
    try {
      // before the fix: this delta landed on the stale base and
      // snapshot(head) silently omitted 'b' until a fold healed it
      db3.insertSeq("t",
        Seq(ChronoRow("c", ts("2024-03-03 10:00:00"), Array(3))))
      val head = db3.history("t").head.version
      assert(keysAt(db3, head) === Set("a", "b", "c"))
      // the resync checkpoint (head-1) is the state the verb FOUND —
      // including the unrecorded write
      assert(db3.history("t").find(_.version == head - 1)
        .exists(_.verb == "resync"))
      assert(keysAt(db3, head - 1) === Set("a", "b"))
      // and the recorded pre-gap version is still served correctly
      assert(keysAt(db3, 1) === Set("a"))
    } finally db3.close()
  }

  test("expireHistory bounds the log by version count: expired versions refuse loudly, newer ones and the live table are intact") {
    val (db, dir) = mk(foldFiles = 2)
    try {
      db.createTable("t")
      def histFiles(): Int =
        new java.io.File(s"$dir/t/_history").list()
          .count(n => n.endsWith(".commit") || n.endsWith(".checkpoint"))
      (1 to 8).foreach { i =>
        db.insertSeq("t", Seq(
          ChronoRow(s"k$i", ts("2024-03-01 10:00:00"), Array(i.toByte))))
      }
      val before = histFiles()
      // keep 3 → horizon at v6; foldEvery=2 puts a checkpoint there, so
      // the sweep lands exactly at the horizon
      val n = db.expireHistory("t", keepVersions = 3)
      assert(n > 0)
      assert(histFiles() < before)
      // the kept versions reconstruct
      assert(keysAt(db, 8).size === 8)
      assert(keysAt(db, 7).size === 7)
      assert(keysAt(db, 6).size === 6)
      // expired versions fail loudly at plan time
      intercept[IllegalStateException] { db.tableAsOf("t", 5).collect() }
      // the live table is untouched
      assert(db.table("t").count() === 8L)
      // churn bound: more mutations + another expire keep the log flat
      (9 to 20).foreach { i =>
        db.insertSeq("t", Seq(
          ChronoRow(s"k$i", ts("2024-03-01 10:00:00"), Array(i.toByte))))
      }
      db.expireHistory("t", keepVersions = 3)
      // bound = keepVersions + one fold interval of commits + the
      // retained checkpoints after the base (foldEvery=2 → at most
      // (3+2) commits + ~4 checkpoints)
      assert(histFiles() <= 10, s"history not bounded: ${histFiles()} files")
      assert(db.table("t").count() === 20L)
    } finally db.close()
  }

  test("estimateRowsInRangeAsOf: sidecar reuse for matching buckets, exact recount of diverged ones") {
    val (db, _) = mk()
    try {
      db.createTable("t")
      // 4 day-buckets x 10 rows
      db.insertSeq("t", (0 until 40).map(i => ChronoRow(s"k$i",
        ts(f"2024-03-${i / 10 + 1}%02d 10:00:00"), Array((i % 127).toByte))))
      db.rebuildColStats("t")
      val v1 = db.history("t").head.version
      val lo = ts("2024-03-01 00:00:00"); val hi = ts("2024-03-04 23:59:59")
      val before = db.estimateRowsInRange("t", lo, hi)
      // post-snapshot mutation drops the first two buckets
      db.deleteWhere("t", org.apache.spark.sql.functions.col("ts") <
        ts("2024-03-03 00:00:00"))
      db.rebuildColStats("t")
      val liveNow = db.estimateRowsInRange("t", lo, hi)
      val asOf = db.estimateRowsInRangeAsOf("t", lo, hi, v1)
      // the snapshot estimate sees all 40 rows (deleted buckets are
      // EXACTLY recounted from the trash-retained snapshot files);
      // the live one sees only the surviving 20
      assert(math.abs(asOf - before) < 0.5, s"asOf=$asOf before=$before")
      assert(asOf > liveNow + 10)
      // a window fully inside the deleted range: live 0, as-of exact 10
      val dLo = ts("2024-03-01 00:00:00"); val dHi = ts("2024-03-01 23:59:59")
      assert(db.estimateRowsInRange("t", dLo, dHi) === 0.0)
      assert(db.estimateRowsInRangeAsOf("t", dLo, dHi, v1) === 10.0)
    } finally db.close()
  }

  test("queryKeyAsOf: snapshot answer, live-bloom pruning on MATCHING buckets, diverged buckets never pruned (r19)") {
    val dir = Files.createTempDirectory("ttkey").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      sketchBloomKeys = 1024, writersPerBucket = 1,
      trashGraceMs = 3600000L))
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(ChronoRow("a1", ts("2024-01-01 10:00:00"),
        Array[Byte](1))))                                        // v1
      db.insertSeq("t", Seq(ChronoRow("b1", ts("2024-01-02 10:00:00"),
        Array[Byte](2))))                                        // v2
      db.insertSeq("t", Seq(ChronoRow("c1", ts("2024-01-03 10:00:00"),
        Array[Byte](3))))                                        // v3
      // diverge day-2: drop b1, land b2 there
      db.deleteKeys("t", Seq("b1"))                              // v4
      db.insertSeq("t", Seq(ChronoRow("b2", ts("2024-01-02 11:00:00"),
        Array[Byte](4))))                                        // v5
      // snapshot semantics: v3 sees b1, not b2; live sees the reverse
      assert(db.queryKeyAsOf("t", "b1", 3L).count() === 1L)
      assert(db.queryKeyAsOf("t", "b2", 3L).count() === 0L)
      assert(db.queryKey("t", "b1").count() === 0L)
      assert(db.queryKey("t", "b2").count() === 1L)
      // pruning: as-of v3, day-1 and day-3 MATCH the live file set →
      // the live blooms prune them for key a1 (absent from day-3);
      // day-2 DIVERGED → always scans. So the a1 lookup reads exactly
      // day-1's one file + day-2's one snapshot file, never day-3's.
      val q = db.queryKeyAsOf("t", "a1", 3L)
      assert(q.collect().map(_.getString(0)).toSeq === Seq("a1"))
      val scanned = PlanMetrics.scannedFiles(q.queryExecution.executedPlan)
      assert(scanned === 2L,
        s"matching-bucket bloom prune + diverged always-scan → 2 files, got $scanned")
      // (expiry refusal rides the shared snapshot gate — pinned by the
      // expireHistory tests; with only the v0 checkpoint on this young
      // table nothing is expirable yet, so no assertion here)
    } finally db.close()
  }

  test("history vacuum keeps the first retained version's commit when a checkpoint sits exactly at the horizon") {
    val (db, dir) = mk(foldFiles = 2)
    try {
      db.createTable("t")
      (1 to 4).foreach { i =>
        db.insertSeq("t", Seq(
          ChronoRow(s"k$i", ts(s"2024-03-0$i 10:00:00"), Array(i.toByte))))
        Thread.sleep(5) // distinct commit epochs
      }
      // foldEvery=2 → checkpoints at v2 and v4; retention cutoff at v2's
      // epoch makes keepFrom = 2 with a checkpoint EXACTLY there
      val e2 = db.history("t").find(_.version == 2L).get.epochMs
      val (cfs, root) = ChronoFs.resolve(s"$dir/t",
        spark.sessionState.newHadoopConf())
      ChronoHistory.vacuum(cfs, root, e2)
      // v2 is inside retention: its commit (and delta) must survive —
      // the pre-fix boundary deleted it because a checkpoint sat at 2
      assert(db.history("t").exists(c =>
        c.version == 2L && c.adds.nonEmpty))
      // the first retained version is fully servable: snapshot AND the
      // diff starting there
      assert(keysAt(db, 2) === Set("k1", "k2"))
      assert(db.changesBetween("t", 2, 4).count() === 2)
      // below the horizon is honestly gone
      intercept[IllegalStateException] { db.tableAsOf("t", 1).collect() }
    } finally db.close()
  }
}
