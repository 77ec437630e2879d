package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine, PlanMetrics}

/** `format("chrono")` connector: content parity with the facade,
  * manifest-backed partition pruning through vanilla filters, the
  * BucketPruneRule ts→bucket derivation, CREATE TABLE USING chrono, and
  * the manifest-less listing fallback. */
class ChronoSourceSpec extends SparkSuite {

  private def mkDb(bucket: String, manifest: Boolean = true): (ChronoDB, String) = {
    val root = Files.createTempDirectory("chronosrc_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = bucket,
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      writersPerBucket = 1, manifest = manifest))
    (db, root)
  }

  private def seed(db: ChronoDB, name: String, days: Int = 10): Unit = {
    import spark.implicits._
    db.createTable(name)
    val rows = (0 until days).flatMap { d =>
      (0 until 20).map { i =>
        ChronoRow(s"k${i % 5}",
          Timestamp.valueOf(f"2024-01-${d + 1}%02d 0${i % 9}:15:00"),
          s"v$d-$i".getBytes("UTF-8"))
      }
    }
    db.insert(name, spark.createDataset(rows))
  }

  private def load(root: String, name: String): DataFrame =
    spark.read.format("chrono").load(s"$root/$name")

  test("format(chrono) content matches the facade's table()") {
    val (db, root) = mkDb("day")
    try {
      seed(db, "ev")
      val viaSource = load(root, "ev")
        .select(col("key"), col("ts"), col("data"), col("bucket"))
      val viaFacade = db.table("ev")
        .select(col("key"), col("ts"), col("data"), col("bucket"))
      assert(viaSource.count() === 200)
      assert(viaSource.exceptAll(viaFacade).isEmpty &&
        viaFacade.exceptAll(viaSource).isEmpty)
      // schema contract: the granularity sniff landed on ts metadata
      val tsField = viaSource.schema("ts")
      assert(tsField.metadata.getString(
        graft.plans.BucketPruneRule.GranularityKey) === "day")
    } finally db.close()
  }

  test("bucket predicate prunes files via the lazy manifest index") {
    val (db, root) = mkDb("day")
    try {
      seed(db, "ev")
      val total = db.stats("ev").numFiles
      val q = load(root, "ev")
        .filter(col("bucket") >= "2024-01-03" && col("bucket") <= "2024-01-05")
      q.collect()
      val scanned = PlanMetrics.scannedFiles(q.queryExecution.executedPlan)
      assert(total === 10L) // one file per day bucket (writersPerBucket=1)
      assert(scanned === 3L, s"expected 3 in-range files, scanned $scanned")
    } finally db.close()
  }

  test("plain ts range derives bucket pruning (BucketPruneRule)") {
    Engine.installOptimizations(spark)
    val (db, root) = mkDb("day")
    try {
      seed(db, "ev")
      val q = load(root, "ev")
        .filter(col("ts") >= lit(Timestamp.valueOf("2024-01-03 00:00:00")) &&
          col("ts") <= lit(Timestamp.valueOf("2024-01-05 23:59:59")))
      val viaFacade = db.query("ev",
        Timestamp.valueOf("2024-01-03 00:00:00"),
        Timestamp.valueOf("2024-01-05 23:59:59"))
      assert(q.count() === viaFacade.count())
      q.collect()
      val scanned = PlanMetrics.scannedFiles(q.queryExecution.executedPlan)
      assert(scanned === 3L,
        s"ts-only filter must prune to the 3 in-range buckets, scanned $scanned")
    } finally db.close()
  }

  test("CREATE TABLE ... USING chrono plans the same pruned scan") {
    Engine.installOptimizations(spark)
    val (db, root) = mkDb("day")
    try {
      seed(db, "ev")
      spark.sql("DROP TABLE IF EXISTS chrono_src_spec")
      spark.sql(
        s"CREATE TABLE chrono_src_spec USING chrono OPTIONS (path '$root/ev')")
      val q = spark.sql(
        """SELECT key, ts FROM chrono_src_spec
          |WHERE ts BETWEEN TIMESTAMP '2024-01-03 00:00:00'
          |              AND TIMESTAMP '2024-01-05 23:59:59'""".stripMargin)
      assert(q.count() === 60)
      q.collect()
      val scanned = PlanMetrics.scannedFiles(q.queryExecution.executedPlan)
      assert(scanned === 3L, s"SQL surface must prune too, scanned $scanned")
    } finally {
      spark.sql("DROP TABLE IF EXISTS chrono_src_spec")
      db.close()
    }
  }

  test("hour-bucket tables sniff granularity and prune hours") {
    Engine.installOptimizations(spark)
    val (db, root) = mkDb("hour")
    try {
      seed(db, "ev")
      val viaSource = load(root, "ev")
      assert(viaSource.schema("ts").metadata.getString(
        graft.plans.BucketPruneRule.GranularityKey) === "hour")
      val q = viaSource
        .filter(col("ts") >= lit(Timestamp.valueOf("2024-01-03 00:00:00")) &&
          col("ts") <= lit(Timestamp.valueOf("2024-01-03 23:59:59")))
      val expect = db.query("ev",
        Timestamp.valueOf("2024-01-03 00:00:00"),
        Timestamp.valueOf("2024-01-03 23:59:59")).count()
      assert(q.count() === expect)
      q.collect()
      val total = db.stats("ev").numFiles
      val scanned = PlanMetrics.scannedFiles(q.queryExecution.executedPlan)
      assert(scanned < total && scanned > 0,
        s"scanned $scanned of $total files — no pruning happened")
    } finally db.close()
  }

  test("manifest-less tables fall back to the listing path") {
    val (db, root) = mkDb("day", manifest = false)
    try {
      seed(db, "ev")
      assert(!Files.exists(java.nio.file.Paths.get(root, "ev", "_manifest")))
      val q = load(root, "ev")
      assert(q.count() === 200)
      val pruned = q.filter(col("bucket") === "2024-01-07")
      pruned.collect()
      val scanned = PlanMetrics.scannedFiles(pruned.queryExecution.executedPlan)
      assert(scanned === 1L)
    } finally db.close()
  }

  test("source sees exactly the manifest: an orphan file is invisible") {
    val (db, root) = mkDb("day")
    try {
      seed(db, "ev")
      // simulate a crashed insert: a data file on disk the manifest
      // never recorded — the scan must NOT read it (quarantine
      // semantics; rebuildManifest is the adoption verb)
      val bucketDir = java.nio.file.Paths.get(root, "ev", "bucket=2024-01-01")
      val victim = {
        import scala.jdk.CollectionConverters._
        val s = Files.list(bucketDir)
        // a real data file, not Hadoop's hidden .crc sibling
        try s.iterator().asScala.find { f =>
          val n = f.getFileName.toString
          n.endsWith(".parquet") && !n.startsWith(".")
        }.get
        finally s.close()
      }
      val orphan = bucketDir.resolve("part-orphan.parquet")
      Files.copy(victim, orphan)
      assert(load(root, "ev").count() === 200)
      db.rebuildManifest("ev")
      assert(load(root, "ev").count() > 200)
    } finally db.close()
  }

  test("write path: df.write.format(chrono) creates a table the facade owns") {
    import java.sql.Timestamp
    val root = Files.createTempDirectory("chronosrc_w").toString
    val rows = spark.createDataFrame((0 until 60).map { i =>
      (s"k${i % 6}", Timestamp.valueOf(f"2024-01-${1 + i % 3}%02d 08:00:00"),
        s"v$i".getBytes("UTF-8"))
    }).toDF("key", "ts", "data")
    rows.write.format("chrono").option("bucket", "day").save(s"$root/ev")
    // readable through the connector AND the facade, sidecars included
    assert(spark.read.format("chrono").load(s"$root/ev").count() === 60)
    assert(Files.isDirectory(java.nio.file.Paths.get(root, "ev", "_manifest")))
    def withDb[A](f: ChronoDB => A): A = {
      val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day"))
      try f(db) finally db.close()
    }
    withDb { db =>
      assert(db.table("ev").count() === 60)
      assert(db.manifestConsistent("ev"))
      // the single-writer contract holds ACROSS entry points: a
      // connector write while the facade owns the data-dir lock is
      // rejected, exactly like a second facade would be
      intercept[Exception] {
        rows.write.format("chrono").option("bucket", "day")
          .mode("append").save(s"$root/ev")
      }
    }
    // append mode adds; the manifest follows
    rows.write.format("chrono").option("bucket", "day")
      .mode("append").save(s"$root/ev")
    withDb { db =>
      assert(db.table("ev").count() === 120)
      assert(db.manifestConsistent("ev"))
    }
    // overwrite drops and recreates
    rows.limit(10).write.format("chrono").option("bucket", "day")
      .mode("overwrite").save(s"$root/ev")
    assert(spark.read.format("chrono").load(s"$root/ev").count() === 10)
    // ErrorIfExists refuses a table with data; Ignore no-ops on one
    intercept[Exception] {
      rows.write.format("chrono").option("bucket", "day").save(s"$root/ev")
    }
    rows.write.format("chrono").option("bucket", "day")
      .mode("ignore").save(s"$root/ev")
    assert(spark.read.format("chrono").load(s"$root/ev").count() === 10)
  }

  test("write path: castable input columns and day-bucket pruning after write") {
    import java.sql.Timestamp
    val root = Files.createTempDirectory("chronosrc_w2").toString
    // key as INT, data as STRING — the connector casts at the boundary
    spark.createDataFrame((0 until 40).map { i =>
      (i % 4, Timestamp.valueOf(f"2024-02-${1 + i % 4}%02d 09:00:00"), s"p$i")
    }).toDF("key", "ts", "data")
      .write.format("chrono").option("bucket", "day").save(s"$root/t")
    val q = spark.read.format("chrono").load(s"$root/t")
      .filter(col("bucket") === "2024-02-03")
    q.collect()
    assert(PlanMetrics.scannedFiles(q.queryExecution.executedPlan) <
      ChronoLayout.listEntries(java.nio.file.Paths.get(root, "t")).size)
    assert(q.count() === 10)
  }

  test("raw INSERT INTO a chrono catalog table fails loudly, never invisibly") {
    // Spark plans INSERT INTO a partitioned HadoopFsRelation as a raw
    // file write (the InsertableRelation analysis branch requires an
    // empty partition spec, and PreprocessTableInsertion always adds
    // the dynamic bucket map) — which would land files the manifest
    // never records: an insert that "succeeds" while its rows stay
    // invisible to every read. The read-only format turns that into an
    // actionable error and the table stays untouched.
    val (db, root) = mkDb("day")
    try {
      seed(db, "ev")
      spark.sql("DROP TABLE IF EXISTS chrono_ins_guard")
      spark.sql(s"CREATE TABLE chrono_ins_guard USING chrono OPTIONS (path '$root/ev')")
      val e = intercept[Exception] {
        spark.sql("INSERT INTO chrono_ins_guard VALUES " +
          "('zzz', TIMESTAMP '2024-01-03 10:00:00', X'01', '2024-01-03')")
      }
      def rootCause(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
      assert(rootCause(e).getMessage.contains("format(\"chrono\")"),
        s"error must point at the supported write paths: $e")
      assert(spark.table("chrono_ins_guard").count() === 200)
      assert(db.manifestConsistent("ev"),
        "a refused insert must leave no stray files")
    } finally {
      spark.sql("DROP TABLE IF EXISTS chrono_ins_guard")
      db.close()
    }
  }

  test("streaming sink: writeStream.format(chrono) ingests micro-batches, Update mode upserts") {
    import java.sql.Timestamp
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("chronosrc_s").toString
    val landing = Files.createTempDirectory("chronosrc_land")
    // two staged micro-batches (maxFilesPerTrigger=1): batch 1 keys
    // k0..k5 v=a, batch 2 the SAME keys v=b — Append keeps both,
    // Update (upsert) keeps only the replacement
    (0 until 2).foreach { b =>
      val rows = spark.createDataFrame((0 until 12).map { i =>
        (s"k${i % 6}",
          Timestamp.valueOf(f"2024-03-0${1 + i % 2} 0$b:00:00"),
          s"v$b".getBytes("UTF-8"))
      }).toDF("key", "ts", "data")
      rows.coalesce(1).write.mode("overwrite").parquet(s"$landing/b$b")
      val part = new java.io.File(s"$landing/b$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, landing.resolve(f"batch$b%03d.parquet"))
    }
    def runStream(mode: String, table: String): Unit = {
      val cp = Files.createTempDirectory("chronosrc_cp")
      val q = spark.readStream
        .schema("key STRING, ts TIMESTAMP, data BINARY")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing.toString)
        .writeStream.format("chrono")
        .option("path", s"$root/$table")
        .option("bucket", "day")
        .option("compactEvery", "2")
        .option("checkpointLocation", cp.toString)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runStream("append", "evs")
    runStream("update", "st")
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day"))
    try {
      // append: both batches' rows; sidecars consistent after the
      // inline maintenance pass
      assert(db.table("evs").count() === 24)
      assert(db.manifestConsistent("evs"))
      // update: per-key replace — only batch 2's rows survive
      assert(db.table("st").count() === 12)
      import spark.implicits._
      val values = db.table("st")
        .select(decode(col("data"), "UTF-8")).as[String]
        .collect().toSet
      assert(values === Set("v1"), s"upsert must keep the replacement: $values")
    } finally db.close()
    // complete mode is meaningless for a keyed store
    intercept[Exception] {
      spark.readStream.schema("key STRING, ts TIMESTAMP, data BINARY")
        .parquet(landing.toString)
        .writeStream.format("chrono")
        .option("path", s"$root/x")
        .option("checkpointLocation",
          Files.createTempDirectory("cp2").toString)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
  }

  test("streaming source: readStream.format(chrono) tails committed inserts without re-reads") {
    import java.sql.Timestamp
    import spark.implicits._
    val root = Files.createTempDirectory("chronosrc_tail").toString
    val out = Files.createTempDirectory("chronosrc_tailout").toString
    val cp = Files.createTempDirectory("chronosrc_tailcp").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      writersPerBucket = 1))
    def batch(tag: Int) = (0 until 20).map(i =>
      graft.core.ChronoRow(s"k${i % 5}",
        Timestamp.valueOf(f"2024-04-${1 + i % 4}%02d 0$tag:00:00"),
        s"b$tag-$i".getBytes("UTF-8")))
    try {
      db.createTable("ev")
      db.insertSeq("ev", batch(0))
      def startQ() = spark.readStream.format("chrono").load(s"$root/ev")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .start()
      val q = startQ()
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 20)
      // rows committed AFTER the stream started arrive as a new batch
      db.insertSeq("ev", batch(1))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 40)
      q.stop()
      // restart from the checkpoint: the seen-log replays — nothing
      // re-emits, and a post-restart insert arrives exactly once
      db.insertSeq("ev", batch(2))
      val q2 = startQ()
      q2.processAllAvailable()
      q2.stop()
      val result = spark.read.parquet(out)
      assert(result.count() === 60)
      // content parity with the table itself, tag by tag
      val byTag = result.select(decode(col("data"), "UTF-8").as[String])
        .collect().groupBy(_.substring(0, 2)).view.mapValues(_.length).toMap
      assert(byTag === Map("b0" -> 20, "b1" -> 20, "b2" -> 20))
      // the streamed rows carry the full read schema incl. bucket
      assert(result.columns.toSet === Set("key", "ts", "data", "bucket"))
    } finally db.close()
  }

  test("reads the .old sidecar when a rewrite crashed mid-swap") {
    val (db, root) = mkDb("day")
    try {
      seed(db, "ev")
      val m = java.nio.file.Paths.get(root, "ev", "_manifest")
      val old = java.nio.file.Paths.get(root, "ev", "_manifest.old")
      Files.move(m, old) // crash window: live dir renamed aside
      assert(load(root, "ev").count() === 200)
      Files.move(old, m) // restore for close()
    } finally db.close()
  }
}
