package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Det, QueryDef, Tables}
import graft.streaming.Streams

/** Streaming surface entries that are batch-verifiable (SURVEY.md §2c
  * S1): run the streaming pipeline to completion on the fixture, then
  * return the landed table — replay equivalence says it must equal the
  * plain batch read, which is exactly what the DuckDB oracle checks.
  *
  * s3b/s5b extend the pattern to STATEFUL semantics: the fixture is
  * split into deterministic micro-batches whose arrival order makes
  * specific rows late, and the DuckDB oracle encodes Spark's exact
  * late-drop rule (drop iff event-time / window-end `<=` watermark,
  * watermark = ms-floor(max event time) − delay carried over from the
  * previous batch — boundary pinned by WatermarkBoundarySpec). The
  * fixtures are tie-free by construction: event times are µs-grained
  * while watermarks are ms-aligned, and no window end lands on the
  * watermark at any shipped SF (verified: max(ts) is never hour-aligned
  * in ms at sf0.001/0.01/0.1).
  */
object StreamingQueries {

  /** Land `batches` one micro-batch at a time: each call appends one
    * parquet file to a landing dir and replays the stream from the SAME
    * checkpoint, so the watermark committed by batch N gates batch N+1
    * exactly as in a long-running stream (Spark recovers it from the
    * offset log on restart). One-restart-per-batch keeps batch
    * boundaries deterministic — a single run over a multi-file
    * directory may coalesce files into one micro-batch, which would
    * erase the late-arrival structure the fixture encodes. Driver-side
    * work is fixture staging only; the streamed operator itself stays
    * fully distributed. */
  private def stagedReplay(
      spark: SparkSession,
      batches: Seq[DataFrame],
      pipeline: DataFrame => DataFrame): DataFrame = {
    val landing = Files.createTempDirectory("stage_landing")
    val outDir = Files.createTempDirectory("stage_out").toString
    val cp = Files.createTempDirectory("stage_cp").toString
    val schema = batches.head.schema
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = Files.createTempDirectory(s"stage_b$i")
      b.coalesce(1).write.mode("overwrite").parquet(s"$tmp/d")
      val part = new java.io.File(s"$tmp/d").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, landing.resolve(f"batch$i%03d.parquet"))
      val src = spark.readStream.schema(schema).parquet(landing.toString)
      val q = pipeline(src).writeStream.format("parquet")
        .option("path", s"$outDir/t").option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      // blocks until all data batches AND any required no-data batch
      // (watermark-advance emission) are committed
      q.processAllAvailable(); q.stop()
    }
    spark.read.parquet(s"$outDir/t")
  }

  /** Two-source [[stagedReplay]]: stream-stream operators need BOTH
    * inputs fed in lockstep micro-batches. Stage i drops one file into
    * each landing dir, restarts the query from its checkpoint (state
    * carries over — the restart is exactly a failure/recovery cycle,
    * so the harness also exercises state restore), and blocks until
    * data AND no-data batches (watermark-advance emissions — where
    * outer-join null rows appear) commit. */
  private def stagedReplay2(
      spark: SparkSession,
      leftBatches: Seq[DataFrame],
      rightBatches: Seq[DataFrame],
      pipeline: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    require(leftBatches.length == rightBatches.length,
      "stream sides must advance in lockstep")
    val landL = Files.createTempDirectory("stage2_l")
    val landR = Files.createTempDirectory("stage2_r")
    val outDir = Files.createTempDirectory("stage2_out").toString
    val cp = Files.createTempDirectory("stage2_cp").toString
    val (schemaL, schemaR) = (leftBatches.head.schema, rightBatches.head.schema)
    def land(b: DataFrame, dir: java.nio.file.Path, i: Int, tag: String): Unit = {
      val tmp = Files.createTempDirectory(s"stage2_$tag$i")
      b.coalesce(1).write.mode("overwrite").parquet(s"$tmp/d")
      val part = new java.io.File(s"$tmp/d").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, dir.resolve(f"batch$i%03d.parquet"))
    }
    leftBatches.zip(rightBatches).zipWithIndex.foreach { case ((lb, rb), i) =>
      land(lb, landL, i, "l"); land(rb, landR, i, "r")
      val srcL = spark.readStream.schema(schemaL).parquet(landL.toString)
      val srcR = spark.readStream.schema(schemaR).parquet(landR.toString)
      val q = pipeline(srcL, srcR).writeStream.format("parquet")
        .option("path", s"$outDir/t").option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      q.processAllAvailable(); q.stop()
    }
    spark.read.parquet(s"$outDir/t")
  }

  /** S3 (declared): watermark late-drop with hash evidence. Batch 1 is
    * the 2-hour "front" of events (sets watermark = max ts − 4 h);
    * batch 2 is everything older — rows whose 1-hour window already
    * closed (window end <= watermark) are DROPPED, the rest still merge
    * into open windows; batch 3 is one synthetic flush row 10 h past
    * the front, advancing the watermark so every surviving window
    * finalizes (its own window stays past the final watermark and is
    * never emitted, so it self-excludes from the output). The oracle
    * recomputes the surviving-row set in SQL and aggregates it. */
  def streamWatermarkDrop(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.normTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("ts"), col("event_type"), col("value"))
    // fixture staging only (split point + flush row), not the data path
    val mx = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val front = ev.filter(col("ts") >= lit(mx) - expr("INTERVAL 2 HOURS"))
    val late = ev.filter(col("ts") < lit(mx) - expr("INTERVAL 2 HOURS"))
    val flush = spark.range(1).select(
      (date_trunc("hour", lit(mx)) + expr("INTERVAL 10 HOURS 10 MINUTES")).as("ts"),
      lit("zz_flush").as("event_type"), lit(0.0).as("value"))
    stagedReplay(spark, Seq(front, late, flush), src =>
      Streams.windowedAgg(src, "ts", "1 hour", None, lateness = "4 hours",
          keys = Seq(col("event_type")),
          aggs = Seq(count(lit(1)).as("n_events"),
            graft.core.Det.dsum(col("value")).as("sum_value")))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n_events"), col("sum_value")))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** S5 (declared): streaming dedup with watermark-bounded state. Same
    * front/late split; Streams.dedup keys on (user_id, event_type, ts),
    * so state for old event times is evictable and any row at-or-below
    * the watermark — novel or duplicate — is dropped on arrival (the
    * exact-dedup contract that keeps state bounded at 100 TB). Output
    * = DISTINCT surviving triples, which is order-insensitive, so the
    * nondeterministic within-batch "which duplicate wins" never shows. */
  def streamDedupSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.normTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("event_type"), col("ts"))
    val mx = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val front = ev.filter(col("ts") >= lit(mx) - expr("INTERVAL 2 HOURS"))
    val late = ev.filter(col("ts") < lit(mx) - expr("INTERVAL 2 HOURS"))
    stagedReplay(spark, Seq(front, late), src =>
      Streams.dedup(src, "ts", "4 hours", Seq("user_id", "event_type")))
      .orderBy(col("user_id"), col("event_type"), col("ts"))
  }

  /** S1: file-source stream → watermark → time-bucketed parquet sink
    * (the reference's ingest path, table.go:78-119, done the Spark way),
    * then read the sink back. Oracle: the batch content of events. */
  /** S18: the INGEST loop through the `chrono` FORMAT SINK
    * ([[graft.sources.ChronoSource.createSink]]) — a user writes
    * `df.writeStream.format("chrono")` and gets the full storage
    * lifecycle with zero engine-specific code: two staged micro-batches
    * (time-ordered halves) insert through ChronoDB (sidecars, manifest,
    * salted layout), `compactEvery=2` runs one inline maintenance pass,
    * and the declared output is the table read BACK through the
    * connector — so the gate pins ingest, maintenance, and read-back in
    * one hash. `maint_ok` verdict: the manifest is consistent after the
    * loop (insert + compact kept the sidecar true). */
  def streamSinkFormatQ(spark: SparkSession, dir: String): DataFrame = {
    val landing = Files.createTempDirectory("s18_landing")
    val root = Files.createTempDirectory("s18_db")
    val cp = Files.createTempDirectory("s18_cp")
    val ev = Tables.t(spark, dir, "events")
      .select(col("user_id").cast("string").as("key"), col("ts"),
        encode(col("event_type"), "UTF-8").as("data"))
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    // staging the landing files is SETUP for the bench split — the
    // operator under measurement is the sink loop itself
    graft.core.BenchPhases.setup {
      Seq(ev.filter(col("ts") < split), ev.filter(col("ts") >= split))
        .zipWithIndex.foreach { case (half, i) =>
          half.coalesce(1).write.mode("overwrite")
            .parquet(s"$landing/stage$i")
          val part = new java.io.File(s"$landing/stage$i").listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          Files.move(part.toPath, landing.resolve(f"batch$i%03d.parquet"))
        }
    }
    val q = spark.readStream
      .schema("key STRING, ts TIMESTAMP, data BINARY")
      .option("maxFilesPerTrigger", 1)
      .parquet(landing.toString)
      .writeStream.format("chrono")
      .option("path", s"$root/ev")
      .option("bucket", "day")
      .option("compactEvery", "2")
      .option("checkpointLocation", cp.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val maintOk = {
      val db = new graft.core.ChronoDB(spark,
        graft.core.ChronoConfig(root.toString, bucket = "day"))
      try db.manifestConsistent("ev") finally db.close()
    }
    spark.read.format("chrono").load(s"$root/ev")
      .select(col("key"), col("ts"),
        decode(col("data"), "UTF-8").as("event_type"))
      .withColumn("maint_ok", lit(maintOk))
      .orderBy(col("key"), col("ts"), col("event_type"))
  }

  /** S19: TAILING a chrono table through the `chrono` FORMAT SOURCE
    * ([[graft.sources.ChronoStreamSource]]) — the inverse of s18: the
    * facade ingests the fixture in two time-ordered halves, a
    * `readStream.format("chrono")` query tails the table (each
    * micro-batch = the files committed since the last trigger,
    * discovered by a KB-scale manifest diff) into a parquet landing,
    * and the declared output is the landing read back — so the gate
    * pins discovery, batch replayability, and content in one hash.
    * `two_batches_ok` verdict: the first drain saw ONLY the first
    * half (a real tail, not one catch-all snapshot). */
  def streamSourceTailQ(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("s19_db")
    val out = Files.createTempDirectory("s19_out").toString
    val cp = Files.createTempDirectory("s19_cp").toString
    import spark.implicits._
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root.toString, bucket = "day"))
    val firstDrain =
      try {
        db.createTable("ev")
        val ev = Tables.t(spark, dir, "events")
          .select(col("user_id").cast("string").as("key"), col("ts"),
            encode(col("event_type"), "UTF-8").as("data"))
          .as[graft.core.ChronoRow]
        val split = lit("2024-01-16 00:00:00").cast("timestamp")
        // seeding inserts are SETUP (both halves — the second lands
        // mid-protocol; the accumulator handles placement)
        graft.core.BenchPhases.setup(db.insert("ev", ev.filter(col("ts") < split)))
        val q = spark.readStream.format("chrono").load(s"$root/ev")
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", cp)
          .start()
        q.processAllAvailable()
        val c1 = spark.read.parquet(out).count()
        graft.core.BenchPhases.setup(db.insert("ev", ev.filter(col("ts") >= split)))
        q.processAllAvailable()
        q.stop()
        c1
      } finally db.close()
    val all = spark.read.parquet(out)
    val total = all.count()
    val twoBatchesOk = firstDrain > 0 && firstDrain < total
    all.select(col("key"), col("ts"),
        decode(col("data"), "UTF-8").as("event_type"))
      .withColumn("two_batches_ok", lit(twoBatchesOk))
      .orderBy(col("key"), col("ts"), col("event_type"))
  }

  /** S22: the STREAMING CHANGE FEED
    * ([[graft.sources.ChronoChangeFeedSource]]) — offsets are HISTORY
    * VERSIONS, each micro-batch the row-level delta of the commits
    * landed since the last trigger, so row-level DML does not kill the
    * stream (the plain tail's append-only contract): it ARRIVES on it.
    * The gate drains the v1 insert, then lands an insert AND a
    * predicate DELETE between triggers and drains again — the feed
    * output is (row, change_type, commit_version), hash-exact against
    * the oracle's replay of all three commits. `two_batches_ok` pins
    * that the first drain saw only v1 (a real feed, not a snapshot). */
  def streamChangeFeedQ(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("s22_db")
    val out = Files.createTempDirectory("s22_out").toString
    val cp = Files.createTempDirectory("s22_cp").toString
    import spark.implicits._
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root.toString, bucket = "day",
        trashGraceMs = 3600000L))
    val firstDrain =
      try {
        db.createTable("ev")
        val ev = Tables.t(spark, dir, "events")
          .select(col("user_id").cast("string").as("key"), col("ts"),
            encode(col("event_type"), "UTF-8").as("data"))
          .as[graft.core.ChronoRow]
        val split = lit("2024-01-16 00:00:00").cast("timestamp")
        graft.core.BenchPhases.setup(
          db.insert("ev", ev.filter(col("ts") < split)))       // v1
        val q = spark.readStream.format("chrono")
          .option("changeFeed", "true")
          .load(s"$root/ev")
          .writeStream.format("parquet")
          .option("path", out)
          .option("checkpointLocation", cp)
          .start()
        q.processAllAvailable()
        val c1 = spark.read.parquet(out).count()
        db.insert("ev", ev.filter(col("ts") >= split))         // v2
        db.deleteWhere("ev", col("ts") <
          lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))  // v3
        q.processAllAvailable()
        q.stop()
        c1
      } finally db.close()
    val all = spark.read.parquet(out)
    val twoBatchesOk = firstDrain > 0 && firstDrain < all.count()
    all.select(col("key"), col("ts"),
        decode(col("data"), "UTF-8").as("event_type"),
        col("_change_type").as("change_type"),
        col("_commit_version").as("commit_version"))
      .withColumn("two_batches_ok", lit(twoBatchesOk))
      .orderBy(col("key"), col("ts"), col("event_type"),
        col("change_type"), col("commit_version"))
  }

  /** S23: the CHANGE FEED on the CATALOG path (VERDICT r17 Missing #5)
    * — `spark.readStream.option("changeFeed", "true").table("cat.ev")`,
    * resolved by [[graft.plans.ChronoCatalogChangeFeedRule]] to the
    * SAME V1 feed source the path form uses, so the two surfaces are
    * identical by construction. The gate proves the wiring end to end
    * AND pins batch-for-batch parity: both feeds run with
    * `maxCommitsPerTrigger = 1` over the same three commits (insert,
    * insert, SQL DELETE), so each surface must produce one batch per
    * commit with identical offset-log ends ([1, 2, 3]) and identical
    * row deltas. Verdict columns: `parity_ok` (row multisets equal),
    * `pacing_ok` (offset ends equal on both), `two_batches_ok` (the
    * catalog feed's first drain saw only v1 — a real feed, not a
    * snapshot). */
  def streamCatalogChangeFeedQ(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Engine.registerTables(spark, dir)
    val root = Files.createTempDirectory("s23_db")
    val outCat = Files.createTempDirectory("s23_outc").toString
    val cpCat = Files.createTempDirectory("s23_cpc").toString
    val outPath = Files.createTempDirectory("s23_outp").toString
    val cpPath = Files.createTempDirectory("s23_cpp").toString
    val cat = s"chrono_s23_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root.toString)
    spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
    spark.conf.set(s"spark.sql.catalog.$cat.trashGrace", "3600")
    try {
      spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, event_type STRING)")
      def insertHalf(cmp: String): Unit = spark.sql(
        s"INSERT INTO $cat.ev (key, ts, event_type) " +
          "SELECT CAST(user_id AS STRING), ts, event_type FROM events " +
          s"WHERE ts $cmp TIMESTAMP '2024-01-16 00:00:00'")
      graft.core.BenchPhases.setup(insertHalf("<"))                     // v1
      val qc = spark.readStream
        .option("changeFeed", "true")
        .option("maxCommitsPerTrigger", "1")
        .table(s"$cat.ev")
        .writeStream.format("parquet")
        .option("path", outCat).option("checkpointLocation", cpCat)
        .start()
      // the PATH form over the same table dir, same pacing — started
      // ALONGSIDE the catalog form and drained at the same stage
      // points (r21, guide §2.6: independent streams' micro-batches
      // overlap instead of replaying the whole feed serially after the
      // catalog stream finished). Pacing evidence is unchanged: qp
      // starts with only v1 committed, so its offset ends are still
      // exactly [1, 2, 3] — one batch per commit on both surfaces.
      val qp = spark.readStream.format("chrono")
        .option("changeFeed", "true")
        .option("maxCommitsPerTrigger", "1")
        .load(s"$root/ev")
        .writeStream.format("parquet")
        .option("path", outPath).option("checkpointLocation", cpPath)
        .start()
      val c1 =
        try {
          val n = graft.core.BenchPhases.phase("1_drain_v1") {
            qc.processAllAvailable()
            qp.processAllAvailable()
            spark.read.parquet(outCat).count()
          }
          graft.core.BenchPhases.setup(insertHalf(">="))                // v2
          graft.core.BenchPhases.phase("2_delete") {
            spark.sql(s"DELETE FROM $cat.ev " +
              "WHERE ts < TIMESTAMP '2024-01-03 00:00:00'")             // v3
          }
          graft.core.BenchPhases.phase("3_drain_v2_v3") {
            qc.processAllAvailable()
            qp.processAllAvailable()
          }
          n
        } finally { // a failed gate must not leak a live stream
          qc.stop()
          qp.stop()
        }
      def offsetEnds(cp: String): Seq[Long] = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(cp, "offsets"))
          .iterator().asScala
          .filter(_.getFileName.toString.forall(_.isDigit))
          .map(p => java.nio.file.Files.readAllLines(p)
            .asScala.last.trim.toLong)
          .toSeq.sorted
      }
      val pacingOk = offsetEnds(cpCat) == Seq(1L, 2L, 3L) &&
        offsetEnds(cpPath) == Seq(1L, 2L, 3L)
      def rows(out: String) = spark.read.parquet(out)
        .select(col("key"), col("ts"), col("event_type"),
          col("_change_type"), col("_commit_version"))
      val (parityOk, twoBatchesOk) =
        graft.core.BenchPhases.phase("4_parity") {
          (rows(outCat).exceptAll(rows(outPath)).isEmpty &&
            rows(outPath).exceptAll(rows(outCat)).isEmpty,
            c1 > 0 && c1 < rows(outCat).count())
        }
      rows(outCat)
        .select(col("key"), col("ts"), col("event_type"),
          col("_change_type").as("change_type"),
          col("_commit_version").as("commit_version"))
        .withColumn("parity_ok", lit(parityOk))
        .withColumn("pacing_ok", lit(pacingOk))
        .withColumn("two_batches_ok", lit(twoBatchesOk))
        .orderBy(col("key"), col("ts"), col("event_type"),
          col("change_type"), col("commit_version"))
        .localCheckpoint()
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.dataDir")
      spark.conf.unset(s"spark.sql.catalog.$cat.bucket")
      spark.conf.unset(s"spark.sql.catalog.$cat.trashGrace")
    }
  }

  /** S24: CDC REPLICATION — the change feed driving a DERIVED table
    * (the pattern a training pipeline uses to maintain a curated copy):
    * a keyed source table takes inserts, an upsert (delete+insert
    * pairs on the feed), and a predicate delete; a `foreachBatch`
    * consumer applies each micro-batch's deltas to a second chrono
    * table IN VERSION ORDER (deletes before inserts within a version —
    * an update pair must not resurrect), with `maxCommitsPerTrigger`
    * pacing the catch-up. Exactly-once end state: the replica's rows
    * must equal the source's rows, both hash-checked against the
    * oracle; `replica_ok` pins the online comparison. */
  def streamCdcReplicateQ(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("s24_db")
    val cp = Files.createTempDirectory("s24_cp").toString
    import spark.implicits._
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root.toString, bucket = "day",
        trashGraceMs = 3600000L))
    try {
      db.createTable("src")
      db.createTable("dst")
      // keyed-unique source: one row per user (latest event),
      // so key-addressed CDC apply is well-defined
      val ev = Tables.t(spark, dir, "events")
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"))
            .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("__rn") === 1).drop("__rn")
        .select(col("user_id").cast("string").as("key"), col("ts"),
          encode(col("event_type"), "UTF-8").as("data"))
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      graft.core.BenchPhases.setup(
        db.insert("src", ev.filter(col("ts") < split).as[graft.core.ChronoRow]))   // v1
      val q = spark.readStream.format("chrono")
        .option("changeFeed", "true")
        .option("maxCommitsPerTrigger", "2")
        .load(s"$root/src")
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val versions = batch.select(col("_commit_version")).distinct()
            .collect().map(_.getLong(0)).sorted
          versions.foreach { v =>
            val delta = batch.filter(col("_commit_version") === v)
              .localCheckpoint()
            val dels = delta.filter(col("_change_type") === "delete")
              .select(col("key")).as[String].collect().toSeq
            if (dels.nonEmpty) db.deleteKeys("dst", dels)
            val ins = delta.filter(col("_change_type") === "insert")
              .select(col("key"), col("ts"), col("data"))
            if (!ins.isEmpty) db.insertFrame("dst", ins)
          }
        }
        .start()
      try {
        q.processAllAvailable()
        // an UPSERT (arrives as delete+insert pairs) and a predicate
        // delete while the stream runs
        db.upsert("src",
          ev.filter(col("ts") >= split).as[graft.core.ChronoRow])       // v2+
        db.deleteWhere("src", col("ts") <
          lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
        q.processAllAvailable()
      } finally q.stop() // a failed gate must not leak a live stream
      def state(t: String) = db.table(t)
        .select(col("key"), col("ts"), decode(col("data"), "UTF-8").as("event_type"))
      val replicaOk = state("dst").exceptAll(state("src")).isEmpty &&
        state("src").exceptAll(state("dst")).isEmpty
      state("dst")
        .withColumn("replica_ok", lit(replicaOk))
        .orderBy(col("key"), col("ts"), col("event_type"))
        .localCheckpoint()
    } finally db.close()
  }

  /** S20: tailing a CATALOG table — `spark.readStream.table("cat.ev")`
    * (VERDICT r16 Missing #2): the V2 twin of s19 over the SAME shared
    * tail state machine ([[graft.sources.ChronoTailLog]] under
    * [[graft.sources.ChronoMicroBatchStream]]), reached with no path
    * and no format string — pure catalog SQL in (INSERT INTO), catalog
    * stream out. Staged replay verdict identical to s19's: the first
    * drain must see ONLY the first half. */
  def streamCatalogTailQ(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Engine.registerTables(spark, dir)
    val root = Files.createTempDirectory("s20_db")
    val out = Files.createTempDirectory("s20_out").toString
    val cp = Files.createTempDirectory("s20_cp").toString
    val cat = s"chrono_s20_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root.toString)
    spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
    try {
      spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, event_type STRING)")
      def insertHalf(cmp: String): Unit = spark.sql(
        s"INSERT INTO $cat.ev (key, ts, event_type) " +
          "SELECT CAST(user_id AS STRING), ts, event_type FROM events " +
          s"WHERE ts $cmp TIMESTAMP '2024-01-16 00:00:00'")
      graft.core.BenchPhases.setup(insertHalf("<"))
      val q = spark.readStream.table(s"$cat.ev")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .start()
      q.processAllAvailable()
      val c1 = spark.read.parquet(out).count()
      graft.core.BenchPhases.setup(insertHalf(">="))
      q.processAllAvailable()
      q.stop()
      val all = spark.read.parquet(out)
      val total = all.count()
      val twoBatchesOk = c1 > 0 && c1 < total
      all.select(col("key"), col("ts"), col("event_type"))
        .withColumn("two_batches_ok", lit(twoBatchesOk))
        .orderBy(col("key"), col("ts"), col("event_type"))
        .localCheckpoint()
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.dataDir")
      spark.conf.unset(s"spark.sql.catalog.$cat.bucket")
    }
  }

  /** S21: `df.writeStream.toTable("cat.ev")` — the STREAMING_WRITE half
    * of the catalog story (s20 is the read half): micro-batches stage
    * as executor-written parquet and the epoch commit ADOPTS them
    * through insertFrame (LOCK + manifest + sidecars; exactly-once via
    * the per-query epoch log — [[graft.sources.ChronoStreamingWrite]]).
    * Gate = the s18 staged-landing shape aimed at a CATALOG table by
    * name, no format string, no path; verdict pins manifest + sidecar
    * consistency after the stream. */
  def streamCatalogSinkQ(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Engine.registerTables(spark, dir)
    val root = Files.createTempDirectory("s21_db")
    val landing = Files.createTempDirectory("s21_landing")
    val cp = Files.createTempDirectory("s21_cp").toString
    val cat = s"chrono_s21_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root.toString)
    spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
    try {
      spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, event_type STRING)")
      val ev = Tables.t(spark, dir, "events")
        .select(col("user_id").cast("string").as("key"), col("ts"),
          col("event_type"))
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      graft.core.BenchPhases.setup {
        Seq(ev.filter(col("ts") < split), ev.filter(col("ts") >= split))
          .zipWithIndex.foreach { case (half, i) =>
            half.coalesce(1).write.mode("overwrite")
              .parquet(s"$landing/stage$i")
            val part = new java.io.File(s"$landing/stage$i").listFiles()
              .filter(_.getName.endsWith(".parquet")).head
            Files.move(part.toPath, landing.resolve(f"batch$i%03d.parquet"))
          }
      }
      val q = spark.readStream
        .schema("key STRING, ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing.toString)
        .writeStream
        .option("checkpointLocation", cp)
        .toTable(s"$cat.ev")
      q.processAllAvailable(); q.stop()
      val maintOk = {
        val db = new graft.core.ChronoDB(spark,
          graft.core.ChronoConfig(root.toString, bucket = "day"))
        try db.manifestConsistent("ev") && db.sidecarsConsistent("ev")
        finally db.close()
      }
      spark.sql(s"SELECT key, ts, event_type FROM $cat.ev")
        .withColumn("maint_ok", lit(maintOk))
        .orderBy(col("key"), col("ts"), col("event_type"))
        .localCheckpoint()
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.dataDir")
      spark.conf.unset(s"spark.sql.catalog.$cat.bucket")
    }
  }

  def streamIngest(spark: SparkSession, dir: String): DataFrame = {
    val staticSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file streaming source wants a landing DIRECTORY — stage the
    // fixture file into one (a real deployment tails a landing dir)
    val landing = Files.createTempDirectory("s1_landing")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      landing.resolve("events.parquet"))
    val src = spark.readStream
      .schema(staticSchema)
      .parquet(landing.toString)
    // normTs only inspects the schema, so it applies to the streaming
    // DataFrame exactly as to a batch one
    val rows = Tables.normTs(src)
    val out = Files.createTempDirectory("s1_ingest").toString
    val cp = Files.createTempDirectory("s1_cp").toString
    val q = Streams.ingestWriter(rows, s"$out/events", cp,
      lateness = "10 minutes", trigger = Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(s"$out/events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .orderBy(col("event_id"))
  }

  /** S4 (batch-checkable form): per-user session windows with a 1-hour
    * idle gap — the exact merge logic `session_window($"ts","1 hour")`
    * applies in the streaming path (Streams.sessionAgg), verified
    * against a gaps-and-islands DuckDB formulation. Session end = last
    * event + gap; sessions are half-open, so an event exactly `gap`
    * after the previous one opens a NEW session. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("sess_start"))

  /** S4 (declared, TRUE streaming): session windows through the staged
    * micro-batch replay — the streaming twin of [[sessionWindows]],
    * checked against the SAME gaps-and-islands oracle. Batches arrive
    * in TIME ORDER (older half, newer half, flush), so no row is late
    * and every event participates; what the replay exercises is the
    * real streaming machinery: RocksDB-free session state carried
    * across restarts, cross-batch session MERGE (a session open at the
    * split extends when the next batch's rows fall inside its gap),
    * and watermark-driven append-mode finalization. The flush row
    * (user −1, 10 h past the front) advances the watermark past every
    * real session's end; its own session stays beyond the final
    * watermark and self-excludes from the output. Safe by
    * construction: a session emitted after batch N has end ≤ wm, and
    * batch N+1 rows are ≥ 4 h (the lateness) newer than wm, so no row
    * can ever extend an already-emitted session. */
  def streamSessionWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.normTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("ts"), col("user_id"), col("value"))
    // fixture staging only (split point + flush row), not the data path
    val mx = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val older = ev.filter(col("ts") < lit(mx) - expr("INTERVAL 2 HOURS"))
    val newer = ev.filter(col("ts") >= lit(mx) - expr("INTERVAL 2 HOURS"))
    val flush = spark.range(1).select(
      (lit(mx) + expr("INTERVAL 10 HOURS")).as("ts"),
      lit(-1L).as("user_id"), lit(0.0).as("value"))
    stagedReplay(spark, Seq(older, newer, flush), src =>
      Streams.sessionAgg(src, "ts", "1 hour", lateness = "4 hours",
          keys = Seq(col("user_id")),
          aggs = Seq(count(lit(1)).as("n_events"),
            Det.dsum(col("value")).as("sum_value")))
        .select(col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"),
          col("user_id"), col("n_events"), col("sum_value")))
      .orderBy(col("user_id"), col("sess_start"))
  }

  /** S2 (declared, TRUE streaming): tumbling 1-hour windows through the
    * staged replay — the streaming twin of the tumbling aggregation,
    * same time-ordered batch protocol as [[streamSessionWindows]]
    * (older, newer, flush; nothing late, every real window finalized by
    * the flush-advanced watermark, the flush's own window
    * self-excluded). Oracle: plain hour-truncated GROUP BY over the
    * whole events table. */
  def streamTumblingWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.normTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("ts"), col("event_type"), col("value"))
    val mx = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val older = ev.filter(col("ts") < lit(mx) - expr("INTERVAL 2 HOURS"))
    val newer = ev.filter(col("ts") >= lit(mx) - expr("INTERVAL 2 HOURS"))
    val flush = spark.range(1).select(
      (lit(mx) + expr("INTERVAL 10 HOURS")).as("ts"),
      lit("zz_flush").as("event_type"), lit(0.0).as("value"))
    stagedReplay(spark, Seq(older, newer, flush), src =>
      Streams.windowedAgg(src, "ts", "1 hour", None, lateness = "4 hours",
          keys = Seq(col("event_type")),
          aggs = Seq(count(lit(1)).as("n_events"),
            Det.dsum(col("value")).as("sum_value")))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n_events"), col("sum_value")))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** S2 sliding variant (declared, TRUE streaming): 2-hour windows
    * sliding every hour through the staged replay — the streaming twin
    * of [[slidingWindows]], same time-ordered batch protocol as
    * [[streamTumblingWindows]]. What the sliding form adds over the
    * tumbling one: each event expands to TWO window rows (an Expand
    * node inside the streaming agg), so window state spans overlapping
    * ranges and the cross-batch merge must reconcile both copies; the
    * flush row's own two windows both end past the final watermark and
    * self-exclude. Oracle: the same generate_series expansion the s2b
    * batch twin pins. */
  def streamSlidingWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.normTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("ts"), col("event_type"), col("value"))
    val mx = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val older = ev.filter(col("ts") < lit(mx) - expr("INTERVAL 2 HOURS"))
    val newer = ev.filter(col("ts") >= lit(mx) - expr("INTERVAL 2 HOURS"))
    val flush = spark.range(1).select(
      (lit(mx) + expr("INTERVAL 10 HOURS")).as("ts"),
      lit("zz_flush").as("event_type"), lit(0.0).as("value"))
    stagedReplay(spark, Seq(older, newer, flush), src =>
      Streams.windowedAgg(src, "ts", "2 hours", Some("1 hour"),
          lateness = "4 hours", keys = Seq(col("event_type")),
          aggs = Seq(count(lit(1)).as("n_events"),
            Det.dsum(col("value")).as("sum_value")))
        .select(col("window.start").as("win_start"),
          col("window.end").as("win_end"), col("event_type"),
          col("n_events"), col("sum_value")))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** S16 (declared, TRUE streaming): CDC apply — a change stream
    * continuously materializes a keyed state table through
    * [[Streams.chronoUpsertSink]] (foreachBatch → ChronoDB.upsert).
    * Three time-ordered change batches land one file each; the query
    * RESTARTS from its checkpoint between batches (the harness's
    * failure/recovery protocol), so what the hash gate pins is the
    * full loop: file-source offset tracking across restarts, per-batch
    * key replacement in storage (delete-then-insert with Bloom-pruned
    * bucket rewrites), and the idempotence that makes replay safe. The
    * final table state per key = the rows of the LAST batch that
    * touched the key — the CDC consumer contract, fixed literal split
    * points so the oracle recomputes it in set algebra. */
  def streamUpsert(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ChronoConfig, ChronoDB}
    val ev = Tables.t(spark, dir, "events")
      .select(col("user_id").cast("string").as("key"), col("ts"),
        encode(col("event_type"), "UTF-8").as("data"))
    val t1 = lit("2024-01-11 00:00:00").cast("timestamp")
    val t2 = lit("2024-01-21 00:00:00").cast("timestamp")
    val batches = Seq(
      ev.filter(col("ts") < t1),
      ev.filter(col("ts") >= t1 && col("ts") < t2),
      ev.filter(col("ts") >= t2))
    val root = Files.createTempDirectory("s16_db").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day"))
    try {
      db.createTable("st")
      val landing = Files.createTempDirectory("s16_landing")
      val cp = Files.createTempDirectory("s16_cp").toString
      val schema = batches.head.schema
      batches.zipWithIndex.foreach { case (b, i) =>
        val tmp = Files.createTempDirectory(s"s16_b$i")
        b.coalesce(1).write.mode("overwrite").parquet(s"$tmp/d")
        val part = new java.io.File(s"$tmp/d").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.move(part.toPath, landing.resolve(f"batch$i%03d.parquet"))
        val q = Streams.chronoUpsertSink(
          spark.readStream.schema(schema).parquet(landing.toString),
          db, "st", cp, trigger = Trigger.ProcessingTime(0)).start()
        q.processAllAvailable(); q.stop()
      }
      db.query("st",
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
        .select(col("key"), col("ts"),
          decode(col("data"), "UTF-8").as("state"))
        .orderBy(col("key"), col("ts"), col("state"))
    } finally db.close()
  }

  /** S2 (sliding form, batch-checkable): 2-hour windows sliding by
    * 1 hour — each event lands in exactly 2 windows, the same assignment
    * `window(ts, "2 hours", "1 hour")` makes in the streaming path
    * (Streams.windowedAgg with slide). Oracle: explode each event to its
    * two hour-aligned window starts. */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** S6 (declared): stream-stream INNER interval join — TRUE streaming
    * through [[stagedReplay2]] since round 12 (rounds ≤11 declared the
    * batch twin; s9/s10 proved the staged harness on the outer forms
    * first). Same lockstep time-ordered split as s9: matches spanning
    * the split boundary exercise live join state and its
    * restore-from-checkpoint. Inner semantics need no watermark close
    * to emit — a match fires as soon as both rows are present — but the
    * flush pair stays: it advances both watermarks so the early rows'
    * join state provably evicts inside the run, and its impossible
    * side-distinct users can never match, so a spuriously emitted flush
    * row would fail the hash compare. Oracle: the plain batch inner
    * join — emission timing is streaming machinery, the RESULT SET must
    * be batch-equivalent. */
  def streamIntervalJoin(spark: SparkSession, dir: String): DataFrame =
    stagedIntervalJoin(spark, dir, "inner")

  /** S5c (declared): streaming NEAR-dup dedup (Streams.nearDupDedup —
    * SimHash fingerprint + dropDuplicatesWithinWatermark). Documents get
    * deterministic event times (epoch + doc_id seconds) and arrive in
    * two interleaved batches (evens, then odds) so cross-batch
    * duplicates hit live state; the 1-day delay keeps every row inside
    * the watermark, so state never evicts mid-stream and the survivor
    * set is exactly one doc per distinct fingerprint. The output is the
    * survivors' fingerprints (no DISTINCT applied — a wrongly surviving
    * duplicate would change the row count and fail the compare), which
    * the oracle recomputes portably (same polynomial token hash as
    * d2b). */
  def streamNearDupSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1704067200L) + col("doc_id")).as("ts"))
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    stagedReplay(spark, Seq(evens, odds), src =>
      Streams.nearDupDedup(src, "ts", "1 day", "text")
        .select(graft.operators.Dedup.simHash(col("text")).as("sig")))
      .orderBy(col("sig"))
  }

  /** S7 (declared): CUSTOM keyed state — Streams.runningCounts
    * (flatMapGroupsWithState) through the staged-replay harness. The
    * fixture arrives as three deterministic micro-batches (event_id mod
    * 3, in order), the operator emits each key's cumulative event count
    * whenever the key receives data, and the file sink (Append operator
    * mode — each emission is a final row) accumulates one row per
    * (key, batch-the-key-appeared-in). That output is exactly the
    * per-key prefix sums of per-batch counts, which the oracle computes
    * as a windowed cumulative SUM over the mod-3 batch index — so the
    * hash check pins the STATE ARITHMETIC across batch boundaries, not
    * just a final total. */
  def streamRunningCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"))
    val batches = (0 until 3).map(i =>
      ev.filter(col("event_id") % 3 === i).select(col("user_id")))
    stagedReplay(spark, batches, src =>
      Streams.runningCounts(
          src.select(col("user_id")).as[Long].groupByKey(identity),
          org.apache.spark.sql.streaming.OutputMode.Append)
        .toDF("user_id", "n_events"))
      .orderBy(col("user_id"), col("n_events"))
  }

  /** S8 (declared): the Spark 4 transformWithState API —
    * Streams.LatestValueProcessor (per-key latest row held as RocksDB
    * ValueState) through the staged-replay harness. Events get unique
    * synthetic event times (epoch + event_id seconds — tie-free, so the
    * processor's argmax is deterministic regardless of within-batch row
    * order) and arrive as three deterministic micro-batches (event_id
    * mod 3, in order). The processor emits the key's CURRENT latest
    * (key, ts, value) whenever the key receives data, so the Append-mode
    * file sink accumulates one row per (key, batch-the-key-appeared-in)
    * — the oracle recomputes exactly that as a running max of per-batch
    * max event ids joined back to the row it identifies. The hash check
    * therefore pins the STATE ARITHMETIC across batch boundaries (a
    * batch of only-older rows must re-emit the previous latest, not
    * regress), not just a final snapshot. */
  def streamLatestValue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"),
        col("user_id").cast("string").as("user_id"),
        timestamp_seconds(lit(1704067200L) + col("event_id")).as("ts"),
        col("value"))
    val batches = (0 until 3).map(i =>
      ev.filter(col("event_id") % 3 === i)
        .select(col("user_id"), col("ts"), col("value")))
    // transformWithState requires the RocksDB state store provider;
    // scope it to this query and restore the session default after
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = stagedReplay(spark, batches, src => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        src.as[(String, java.sql.Timestamp, Double)]
          .groupByKey(_._1)
          .transformWithState(new Streams.LatestValueProcessor,
            TimeMode.None(), OutputMode.Append())
          .toDF("user_id", "ts", "value")
      })
      // the staged output is materialized parquet, so ordering it here
      // happens after the streaming queries are done and the conf can
      // be restored safely below
      out.orderBy(col("user_id"), col("ts"), col("value"))
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  /** S11 (declared): transformWithState over MAP state —
    * Streams.CategoryCountsProcessor (per-user per-event_type running
    * counts in RocksDB MapState) through the staged-replay harness.
    * Batches are event_id mod 3 in order (the s7/s8 split); the
    * processor emits the CURRENT count for every (user, type) the
    * batch touched, so the Append sink accumulates one row per
    * (user, type, batch-it-appeared-in) and the oracle recomputes
    * exactly that as a cumulative per-(user, type) sum over the batch
    * index. The hash check pins per-entry map-state arithmetic across
    * batch AND restart boundaries (stagedReplay restarts the query per
    * batch, so state restore is exercised too). Output rows ordered by
    * (user, type, n) — unique because counts strictly increase. */
  def streamCategoryCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"),
        col("user_id").cast("string").as("user_id"), col("event_type"))
    val batches = (0 until 3).map(i =>
      ev.filter(col("event_id") % 3 === i)
        .select(col("user_id"), col("event_type")))
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = stagedReplay(spark, batches, src => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        src.as[(String, String)]
          .groupByKey(_._1)
          .transformWithState(new Streams.CategoryCountsProcessor,
            TimeMode.None(), OutputMode.Append())
          .toDF("user_id", "event_type", "n")
      })
      out.orderBy(col("user_id"), col("event_type"), col("n"))
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  /** S12 (declared): transformWithState over LIST state —
    * Streams.TopIdsProcessor (per-user bounded top-3 event-id buffer
    * in RocksDB ListState) through the staged replay; batches are
    * event_id mod 3 in order. Each batch a user appears in emits the
    * user's CURRENT top-3 ids, so the oracle enumerates, per (user,
    * batch-present), the 3 largest ids with batch index ≤ that batch.
    * Cross-batch repeats (a top-3 that survives a batch unchanged
    * re-emits identically) are legitimate duplicates on both sides —
    * the driver's compare hashes the multiset, so they pin rather than
    * break the check. */
  def streamTopIds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"),
        col("user_id").cast("string").as("user_id"))
    val batches = (0 until 3).map(i =>
      ev.filter(col("event_id") % 3 === i)
        .select(col("user_id"), col("event_id")))
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = stagedReplay(spark, batches, src => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        src.as[(String, Long)]
          .groupByKey(_._1)
          .transformWithState(new Streams.TopIdsProcessor(3),
            TimeMode.None(), OutputMode.Append())
          .toDF("user_id", "event_id")
      })
      out.orderBy(col("user_id"), col("event_id"))
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  /** S13 (declared): event-time TIMERS through transformWithState —
    * Streams.TimerCountsProcessor holds per-user counts and emits ONLY
    * when the watermark passes (last event + 60 days): no input row
    * triggers output, the timer machinery does. Fixture: a time-ordered
    * two-batch split of events plus a flush row 61 days past the front
    * — the flush watermark stands past every real user's expiry, so
    * each emits its TOTAL count exactly once (the gap exceeds the
    * fixture span, so no mid-stream closes), while the flush key's own
    * timer never fires and it self-excludes. Oracle: plain per-user
    * counts. What the hash pins: timer registration/re-arm/delete
    * across batches AND restarts, watermark-driven firing, and the
    * emit-exactly-once-then-clear close semantics. */
  def streamTimerCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.normTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("user_id").cast("string").as("user_id"), col("ts"))
    val mx = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val split = lit(mx) - expr("INTERVAL 15 DAYS")
    val flush = spark.range(1).select(lit("zz_flush").as("user_id"),
      (lit(mx) + expr("INTERVAL 61 DAYS")).as("ts"))
    val batches = Seq(
      ev.filter(col("ts") < split), ev.filter(col("ts") >= split), flush)
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = stagedReplay(spark, batches, src => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        src.withWatermark("ts", "1 minute")
          .as[(String, java.sql.Timestamp)]
          .groupByKey(_._1)
          .transformWithState(
            new Streams.TimerCountsProcessor(60L * 86400 * 1000),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "n")
      })
      out.orderBy(col("user_id"), col("n"))
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  /** S9 (declared): stream-stream LEFT OUTER interval join — the TRUE
    * streaming form through [[stagedReplay2]], not a batch twin. Clicks
    * and purchases arrive as two lockstep micro-batch pairs split at a
    * fixed mid-fixture instant — TIME-ordered, as a replayed stream
    * must be: a parity split would put batch 2 wholly behind batch 1's
    * watermark and the join would (correctly!) drop it as late. Matches
    * spanning the split boundary exercise live join state and its
    * restore-from-checkpoint; batch 2's watermark advance also makes
    * the early unmatched clicks emit their null rows MID-STREAM (state
    * evicts incrementally, not only at flush). Then one flush pair
    * (impossible users, DISTINCT per side so they cannot match each
    * other, 10 h past the fixture max) advances BOTH
    * watermarks so every real click's match window provably closes:
    * unmatched clicks emit their null-extended row exactly once — the
    * same instant their join state evicts. The flush rows self-exclude
    * (their own windows never close before the final watermark), and no
    * defensive filter hides that: a spuriously emitted flush row would
    * fail the hash compare. Oracle: the plain batch LEFT (or FULL)
    * JOIN — outer emission timing is streaming machinery, the RESULT
    * SET must be batch-equivalent. */
  private def stagedIntervalJoin(
      spark: SparkSession, dir: String, joinType: String): DataFrame = {
    val ev = Tables.normTs(spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    def side(kind: String) = ev.filter(col("event_type") === kind)
      .select(col("event_id"), col("user_id"), col("ts"))
    val (clicks, purchases) = (side("click"), side("purchase"))
    // fixture staging only (flush timestamp), not the data path
    val mx = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    def flush(user: Long) = spark.range(1).select(lit(-1L).as("event_id"),
      lit(user).as("user_id"),
      (lit(mx) + expr("INTERVAL 10 HOURS")).as("ts"))
    val split = lit(java.sql.Timestamp.valueOf("2024-01-16 00:00:00"))
    def batches(df: org.apache.spark.sql.DataFrame, flushUser: Long) = Seq(
      df.filter(col("ts") < split),
      df.filter(col("ts") >= split),
      flush(flushUser))
    stagedReplay2(spark, batches(clicks, -1L), batches(purchases, -2L), (l, r) =>
      Streams.intervalJoin(l, r, "user_id", "ts",
          lateness = "10 minutes", lookback = "1 hour", lookahead = "1 hour",
          joinType = joinType)
        .select(col("l.event_id").as("click_id"),
          coalesce(col("l.user_id"), col("r.user_id")).as("user_id"),
          col("l.ts").as("c_ts"),
          col("r.event_id").as("purchase_id"), col("r.ts").as("p_ts")))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  def streamOuterIntervalJoin(spark: SparkSession, dir: String): DataFrame =
    stagedIntervalJoin(spark, dir, "leftOuter")

  /** S10 (declared): the FULL OUTER sibling of s9 — unmatched rows on
    * BOTH sides emit their null-extended row exactly once when their
    * window provably closes; the same two-source staged replay and
    * flush discipline apply (side-distinct impossible users keep both
    * flush rows out of the result). Oracle: the batch FULL JOIN. */
  def streamFullOuterIntervalJoin(spark: SparkSession, dir: String): DataFrame =
    stagedIntervalJoin(spark, dir, "fullOuter")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("s10_full_outer_interval_join", streamFullOuterIntervalJoin, Some(
      """SELECT c.event_id AS click_id,
        |       COALESCE(c.user_id, p.user_id) AS user_id, c.ts AS c_ts,
        |       p.event_id AS purchase_id, p.ts AS p_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id
        | AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY click_id ASC NULLS FIRST, purchase_id ASC NULLS FIRST""".stripMargin)),
    QueryDef("s9_outer_interval_join", streamOuterIntervalJoin, Some(
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS c_ts,
        |       p.event_id AS purchase_id, p.ts AS p_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON p.user_id = c.user_id
        | AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id ASC NULLS FIRST""".stripMargin)),
    QueryDef("s13_timer_counts", streamTimerCounts, Some(
      // every real user's close timer fires under the flush watermark
      // and emits its total count exactly once; the flush key's own
      // timer never fires
      """SELECT CAST(user_id AS VARCHAR) AS user_id,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY user_id, n""".stripMargin)),
    QueryDef("s12_top_ids", streamTopIds, Some(
      // per (user, batch-present): the 3 largest ids with batch index
      // <= that batch — the ListState buffer's contents at each emit
      """WITH b AS (
        |  SELECT CAST(user_id AS VARCHAR) AS user_id, event_id,
        |         event_id % 3 AS bi
        |  FROM events),
        |present AS (SELECT DISTINCT user_id, bi FROM b),
        |pairs AS (
        |  SELECT p.user_id, p.bi, x.event_id
        |  FROM present p JOIN b x
        |    ON x.user_id = p.user_id AND x.bi <= p.bi),
        |r AS (
        |  SELECT user_id, bi, event_id,
        |         row_number() OVER (PARTITION BY user_id, bi
        |                            ORDER BY event_id DESC) AS rn
        |  FROM pairs)
        |SELECT user_id, event_id
        |FROM r WHERE rn <= 3 ORDER BY user_id, event_id""".stripMargin)),
    QueryDef("s11_category_counts", streamCategoryCounts, Some(
      // one emission per (user, type, batch-it-appeared-in) carrying
      // the cumulative count up to that batch — the per-entry MapState
      // arithmetic in SQL
      """WITH b AS (
        |  SELECT CAST(user_id AS VARCHAR) AS user_id, event_type,
        |         event_id % 3 AS bi
        |  FROM events),
        |c AS (SELECT user_id, event_type, bi, COUNT(*) AS nb
        |      FROM b GROUP BY 1, 2, 3)
        |SELECT user_id, event_type,
        |       CAST(SUM(nb) OVER (PARTITION BY user_id, event_type
        |                          ORDER BY bi) AS BIGINT) AS n
        |FROM c ORDER BY user_id, event_type, n""".stripMargin)),
    QueryDef("s8_latest_value", streamLatestValue, Some(
      """WITH c AS (
        |  SELECT CAST(user_id AS VARCHAR) AS user_id, event_id % 3 AS bi,
        |         max(event_id) AS mx
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, bi,
        |         max(mx) OVER (PARTITION BY user_id ORDER BY bi) AS me
        |  FROM c)
        |SELECT r.user_id,
        |       make_timestamp((1704067200 + r.me) * 1000000) AS ts,
        |       e.value
        |FROM r JOIN events e ON e.event_id = r.me
        |ORDER BY r.user_id, ts, value""".stripMargin)),
    QueryDef("s7_running_counts", streamRunningCounts, Some(
      """WITH b AS (SELECT user_id, event_id % 3 AS bi FROM events),
        |c AS (SELECT user_id, bi, COUNT(*) AS n FROM b GROUP BY user_id, bi),
        |cum AS (
        |  SELECT user_id,
        |         CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY bi) AS BIGINT)
        |           AS n_events
        |  FROM c)
        |SELECT user_id, n_events FROM cum
        |ORDER BY user_id, n_events""".stripMargin)),
    QueryDef("s6_interval_join", streamIntervalJoin, Some(
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS c_ts,
        |       p.event_id AS purchase_id, p.ts AS p_ts
        |FROM events c JOIN events p ON p.user_id = c.user_id
        | AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts + INTERVAL 1 HOUR
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |ORDER BY click_id, purchase_id""".stripMargin)),
    QueryDef("s1_stream_ingest", streamIngest, Some(
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin)),
    QueryDef("s19_stream_source_chrono", streamSourceTailQ, Some(
      // the tail must deliver EXACTLY the table (each file once); the
      // staged-discovery claim is the in-query two_batches_ok verdict
      """SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type,
        |       TRUE AS two_batches_ok
        |FROM events
        |ORDER BY key, ts, event_type""".stripMargin)),
    QueryDef("s20_stream_catalog_tail", streamCatalogTailQ, Some(
      // identical delivery contract to s19, reached through the catalog
      """SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type,
        |       TRUE AS two_batches_ok
        |FROM events
        |ORDER BY key, ts, event_type""".stripMargin)),
    QueryDef("s22_stream_change_feed", streamChangeFeedQ, Some(
      // the feed must replay all three commits' row deltas with their
      // versions: v1/v2 the two insert halves, v3 the delete's rows
      """SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type,
        |       'insert' AS change_type,
        |       CAST(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |            THEN 1 ELSE 2 END AS BIGINT) AS commit_version,
        |       TRUE AS two_batches_ok
        |FROM events
        |UNION ALL
        |SELECT CAST(user_id AS VARCHAR), ts, event_type, 'delete',
        |       CAST(3 AS BIGINT), TRUE
        |FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
        |ORDER BY key, ts, event_type, change_type, commit_version""".stripMargin)),
    QueryDef("s24_cdc_replicate", streamCdcReplicateQ, Some(
      // replica end state = latest event per user, minus the deleted
      // window — exactly the source's final state; the online
      // src-vs-dst comparison is the in-query verdict
      """WITH latest AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT key, ts, event_type, TRUE AS replica_ok
        |FROM latest
        |WHERE rn = 1 AND ts >= TIMESTAMP '2024-01-03 00:00:00'
        |ORDER BY key, ts, event_type""".stripMargin)),
    QueryDef("s23_stream_catalog_cdf", streamCatalogChangeFeedQ, Some(
      // same commit structure as s22 (two insert halves + a delete),
      // served through the catalog rule; parity/pacing are in-query
      // verdicts pinned TRUE
      """SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type,
        |       'insert' AS change_type,
        |       CAST(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |            THEN 1 ELSE 2 END AS BIGINT) AS commit_version,
        |       TRUE AS parity_ok, TRUE AS pacing_ok, TRUE AS two_batches_ok
        |FROM events
        |UNION ALL
        |SELECT CAST(user_id AS VARCHAR), ts, event_type, 'delete',
        |       CAST(3 AS BIGINT), TRUE, TRUE, TRUE
        |FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
        |ORDER BY key, ts, event_type, change_type, commit_version""".stripMargin)),
    QueryDef("s21_stream_catalog_sink", streamCatalogSinkQ, Some(
      // the adopt protocol must land EXACTLY the fixture (exactly-once
      // epochs); the maintenance claim is the in-query verdict
      """SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type,
        |       TRUE AS maint_ok
        |FROM events
        |ORDER BY key, ts, event_type""".stripMargin)),
    QueryDef("s18_stream_sink_chrono", streamSinkFormatQ, Some(
      // the staged loop must land EXACTLY the fixture (at-least-once
      // with a clean run = exactly-once); the maintenance claim is the
      // in-query manifest-consistency verdict
      """SELECT CAST(user_id AS VARCHAR) AS key, ts, event_type,
        |       TRUE AS maint_ok
        |FROM events
        |ORDER BY key, ts, event_type""".stripMargin)),
    QueryDef("s3b_watermark_drop", streamWatermarkDrop, Some(
      s"""WITH mx AS (SELECT max(ts) AS m,
         |                   (epoch_us(max(ts)) // 1000) * 1000 AS m_ms
         |            FROM events),
         |surv AS (
         |  SELECT e.* FROM events e, mx
         |  WHERE e.ts >= mx.m - INTERVAL 2 HOUR
         |     OR epoch_us(date_trunc('hour', e.ts)) + 3600000000
         |          > mx.m_ms - 14400000000)
         |SELECT date_trunc('hour', ts) AS win_start, event_type,
         |       COUNT(*) AS n_events, ${Det.dsumSql("value")} AS sum_value
         |FROM surv GROUP BY win_start, event_type
         |ORDER BY win_start, event_type""".stripMargin)),
    QueryDef("s5c_stream_neardup", streamNearDupSurvivors, Some(
      // one survivor per distinct SimHash fingerprint; the signature is
      // the same portable polynomial construction the d2b oracle pins
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, list_transform(toks, tk ->
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(split(tk, ''), c -> CAST(unicode(c) AS BIGINT))),
        |        (a, c) -> (a * 131 + c) % 2147483647) * 2147483648
        |    + list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(split(tk, ''), c -> CAST(unicode(c) AS BIGINT))),
        |        (a, c) -> (a * 137 + c) % 2147483629)) AS hs
        |  FROM t),
        |s AS (
        |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(0, 61), j ->
        |        CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
        |               list_transform(hs, x -> CAST(2 * ((x >> j) & 1) - 1 AS BIGINT))),
        |             (a, b) -> a + b) > 0
        |        THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)),
        |    (a, b) -> a | b) AS sig
        |  FROM h)
        |SELECT DISTINCT sig FROM s ORDER BY sig""".stripMargin)),
    QueryDef("s5b_stream_dedup", streamDedupSurvivors, Some(
      """WITH mx AS (SELECT max(ts) AS m,
        |                   (epoch_us(max(ts)) // 1000) * 1000 AS m_ms
        |            FROM events)
        |SELECT DISTINCT user_id, event_type, ts FROM events, mx
        |WHERE ts >= mx.m - INTERVAL 2 HOUR
        |   OR epoch_us(ts) > mx.m_ms - 14400000000
        |ORDER BY user_id, event_type, ts""".stripMargin)),
    QueryDef("s2b_sliding_window", slidingWindows, Some(
      s"""WITH x AS (
         |  SELECT event_type, value,
         |         date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS win_start
         |  FROM events, generate_series(0, 1) g(k))
         |SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end, event_type,
         |       COUNT(*) AS n_events, ${Det.dsumSql("value")} AS sum_value
         |FROM x GROUP BY win_start, event_type
         |ORDER BY win_start, event_type""".stripMargin)),
    QueryDef("s14_stream_session", streamSessionWindows, Some(
      s"""WITH o AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |s AS (
         |  SELECT user_id, ts, value,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |                   ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM o)
         |SELECT min(ts) AS sess_start,
         |       max(ts) + INTERVAL 1 HOUR AS sess_end,
         |       user_id, COUNT(*) AS n_events, ${Det.dsumSql("value")} AS sum_value
         |FROM s GROUP BY user_id, sess
         |ORDER BY user_id, sess_start""".stripMargin)),
    QueryDef("s16_stream_upsert", streamUpsert, Some(
      // the CDC contract in set algebra: each key's state is the rows
      // of the last time-third that contains the key
      """WITH e AS (
        |  SELECT user_id, ts, event_type,
        |    CASE WHEN ts < TIMESTAMP '2024-01-11 00:00:00' THEN 0
        |         WHEN ts < TIMESTAMP '2024-01-21 00:00:00' THEN 1
        |         ELSE 2 END AS b
        |  FROM events),
        |m AS (SELECT user_id, max(b) AS mb FROM e GROUP BY user_id)
        |SELECT CAST(e.user_id AS VARCHAR) AS key, e.ts,
        |       e.event_type AS state
        |FROM e JOIN m ON e.user_id = m.user_id AND e.b = m.mb
        |ORDER BY key, ts, state""".stripMargin)),
    QueryDef("s17_stream_sliding", streamSlidingWindows, Some(
      s"""WITH x AS (
         |  SELECT event_type, value,
         |         date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS win_start
         |  FROM events, generate_series(0, 1) g(k))
         |SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end, event_type,
         |       COUNT(*) AS n_events, ${Det.dsumSql("value")} AS sum_value
         |FROM x GROUP BY win_start, event_type
         |ORDER BY win_start, event_type""".stripMargin)),
    QueryDef("s15_stream_tumbling", streamTumblingWindows, Some(
      s"""SELECT date_trunc('hour', ts) AS win_start, event_type,
         |       COUNT(*) AS n_events, ${Det.dsumSql("value")} AS sum_value
         |FROM events GROUP BY win_start, event_type
         |ORDER BY win_start, event_type""".stripMargin)),
    QueryDef("s3_session_window", sessionWindows, Some(
      s"""WITH o AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |s AS (
         |  SELECT user_id, ts, value,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |                   ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM o)
         |SELECT min(ts) AS sess_start,
         |       max(ts) + INTERVAL 1 HOUR AS sess_end,
         |       user_id, COUNT(*) AS n_events, ${Det.dsumSql("value")} AS sum_value
         |FROM s GROUP BY user_id, sess
         |ORDER BY user_id, sess_start""".stripMargin))
  )
}
