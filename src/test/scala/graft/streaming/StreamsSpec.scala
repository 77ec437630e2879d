package graft.streaming

import graft.SparkSuite
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

case class Ev(key: String, ts: Timestamp, value: Double)
case class Doc(doc_id: Long, ts: Timestamp, text: String)

class StreamsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("S1 ingest: streamed rows land in bucketed parquet; batch read equals input (replay equivalence)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dir = Files.createTempDirectory("ingest").toString
    val cp = Files.createTempDirectory("cp").toString
    val q = Streams.ingestWriter(
        mem.toDF(), s"$dir/t", cp, lateness = "1 minute",
        trigger = Trigger.ProcessingTime(0)).start()
    val batch1 = Seq(
      Ev("a", ts("2024-01-01 10:00:01"), 1.0),
      Ev("b", ts("2024-01-01 11:00:02"), 2.0))
    val batch2 = Seq(Ev("c", ts("2024-01-01 11:59:59"), 3.0))
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/t")
    assert(out.count() === 3)
    // bucket layout matches the batch engine's
    assert(out.select("bucket").distinct().as[String].collect().sorted.toSeq ===
      Seq("2024-01-01-10", "2024-01-01-11"))
    // replay equivalence: streamed content == the batch of all inputs
    val streamed = out.select("key", "ts", "value").as[Ev].collect().sortBy(_.key)
    assert(streamed.toSeq === (batch1 ++ batch2).sortBy(_.key))
  }

  test("S2/S3 windowed agg emits finalized windows and drops late data") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = Streams.windowedAgg(mem.toDF(), "ts", "5 minutes", None,
      lateness = "5 minutes", keys = Seq(col("key")),
      aggs = Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    // fill window [10:00,10:05)
    mem.addData(Ev("a", ts("2024-01-01 10:00:30"), 1),
      Ev("a", ts("2024-01-01 10:03:00"), 1))
    q.processAllAvailable()
    // advance watermark past window end: 10:20 - 5m = 10:15 > 10:05
    mem.addData(Ev("a", ts("2024-01-01 10:20:00"), 1))
    q.processAllAvailable()
    val afterFinalize = spark.table("win_out")
      .where("window.start = timestamp'2024-01-01 10:00:00'")
      .select("n").as[Long].collect()
    assert(afterFinalize.toSeq === Seq(2L)) // window emitted once, n=2
    // a late row for the finalized window is DROPPED (no new emission)
    mem.addData(Ev("a", ts("2024-01-01 10:01:00"), 1))
    q.processAllAvailable()
    val afterLate = spark.table("win_out")
      .where("window.start = timestamp'2024-01-01 10:00:00'")
      .select("n").as[Long].collect()
    assert(afterLate.toSeq === Seq(2L))
    q.stop()
  }

  test("S2 sliding windows assign each event to windowDur/slide windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = Streams.windowedAgg(mem.toDF(), "ts", "10 minutes", Some("5 minutes"),
      lateness = "1 minute", keys = Seq(col("key")),
      aggs = Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("slide_out")
      .outputMode("complete").start()
    mem.addData(Ev("a", ts("2024-01-01 10:07:00"), 1))
    q.processAllAvailable()
    // one event, two overlapping 10m/5m windows — same assignment the
    // batch-checkable s2b_sliding_window query verifies against DuckDB
    val wins = spark.table("slide_out")
      .select("window.start").as[Timestamp].collect().map(_.toString).sorted
    assert(wins.toSeq === Seq("2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0"))
    q.stop()
  }

  test("S4 session windows split on gap") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = Streams.sessionAgg(mem.toDF(), "ts", gap = "5 minutes",
      lateness = "1 minute", keys = Seq(col("key")),
      aggs = Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    mem.addData(
      Ev("a", ts("2024-01-01 10:00:00"), 1),
      Ev("a", ts("2024-01-01 10:03:00"), 1), // same session (gap 3m < 5m)
      Ev("a", ts("2024-01-01 10:20:00"), 1)) // new session (gap 17m)
    q.processAllAvailable()
    val sessions = spark.table("sess_out").select("n").as[Long].collect().sorted
    assert(sessions.toSeq === Seq(1L, 2L))
    q.stop()
  }

  test("S2 windowed agg carries OHLC aggregates: algebraic min_by/max_by work under watermarks") {
    // Resample.ohlc's aggregate set is algebraic, so the SAME bars a
    // batch downsample produces stream out of windowedAgg — the
    // time-series store's "continuous downsampling" verb with no extra
    // operator. Cross-batch merge: open arrives in batch 1, close in
    // batch 2, the finalized window must combine both.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = Streams.windowedAgg(mem.toDF(), "ts", "10 minutes", None,
      lateness = "5 minutes", keys = Seq(col("key")),
      aggs = Seq(
        min_by(col("value"), struct(col("ts"), col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("value"))).as("close"),
        count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    mem.addData(
      Ev("s", ts("2024-01-01 10:00:10"), 5.0),  // open
      Ev("s", ts("2024-01-01 10:03:00"), 9.0))  // high
    q.processAllAvailable()
    mem.addData(
      Ev("s", ts("2024-01-01 10:06:00"), 1.0),  // low
      Ev("s", ts("2024-01-01 10:09:00"), 6.0))  // close
    q.processAllAvailable()
    mem.addData(Ev("s", ts("2024-01-01 10:30:00"), 0.0)) // advance watermark
    q.processAllAvailable()
    val bars = spark.table("ohlc_out")
      .where("window.start = timestamp'2024-01-01 10:00:00'")
      .select("open", "high", "low", "close", "n")
      .as[(Double, Double, Double, Double, Long)].collect()
    assert(bars.toSeq === Seq((5.0, 9.0, 1.0, 6.0, 4L)))
    q.stop()
  }

  test("S5 streaming dedup removes exact (key, ts) duplicates across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dd = Streams.dedup(mem.toDF(), "ts", "10 minutes", Seq("key"))
    val q = dd.writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    mem.addData(Ev("a", ts("2024-01-01 10:00:00"), 1),
      Ev("a", ts("2024-01-01 10:00:00"), 1)) // dup within batch
    q.processAllAvailable()
    mem.addData(Ev("a", ts("2024-01-01 10:00:00"), 1)) // dup across batches
    q.processAllAvailable()
    assert(spark.table("dd_out").count() === 1)
    q.stop()
  }

  test("S5b streaming near-dup dedup drops fingerprint-identical variants") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val dd = Streams.nearDupDedup(mem.toDF(), "ts", "10 minutes", "text")
    val q = dd.writeStream.format("memory").queryName("ndd_out")
      .outputMode("append").start()
    mem.addData(
      Doc(1L, ts("2024-01-01 10:00:00"), "The quick brown fox!"),
      Doc(2L, ts("2024-01-01 10:00:10"), "the QUICK   brown fox"), // variant
      Doc(3L, ts("2024-01-01 10:00:20"), "an entirely different document"))
    q.processAllAvailable()
    // cross-batch variant of doc 3
    mem.addData(Doc(4L, ts("2024-01-01 10:01:00"), "An entirely different document."))
    q.processAllAvailable()
    val kept = spark.table("ndd_out").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L))
    q.stop()
  }

  test("stateless curation ops compose with a stream and match their batch results") {
    // hashSample / assignSplit / quality scoring are pure row-local
    // column expressions, so the SAME code runs under readStream — the
    // property a 100 TB pipeline needs to curate data on ingest instead
    // of in a second batch pass. Streamed output must equal the batch
    // run over the same rows (deterministic, no RNG state).
    import graft.operators.Curation
    import graft.functions.TextFunctions
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val curated = mem.toDF()
      .filter(Curation.hashSample(col("doc_id"), 0.5))
      .transform(df => Curation.assignSplit(df, "doc_id",
        Seq("train" -> 0.9, "val" -> 0.1), seed = 7L))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
    val q = curated.writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    val rows = (0L until 200L).map(i =>
      Doc(i, ts("2024-01-01 10:00:00"), s"document number $i with some words"))
    mem.addData(rows.take(120): _*); q.processAllAvailable()
    mem.addData(rows.drop(120): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curated_out")
      .select("doc_id", "split", "quality")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val batch = rows.toDF()
      .filter(Curation.hashSample(col("doc_id"), 0.5))
      .transform(df => Curation.assignSplit(df, "doc_id",
        Seq("train" -> 0.9, "val" -> 0.1), seed = 7L))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .select("doc_id", "split", "quality")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty && streamed.length < 200) // sample really filtered
  }

  test("streaming Count-Min: per-batch sketches merge across micro-batches to the batch sketch") {
    // the mergeable-sketch streaming pattern: each micro-batch builds
    // its own bounded counter table (Sketches.cmsBuild) and merges by
    // plain counter addition — kilobytes of state per batch, and the
    // running sketch equals the one-shot batch sketch exactly
    import graft.operators.Sketches
    import graft.functions.TextFunctions
    import scala.collection.mutable
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Doc]
    val acc = mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    val q = mem.toDF().writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
      Sketches.cmsBuild(
          batch.select(explode(TextFunctions.tokens(col("text"))).as("term")),
          "term", depth = 4, width = 64)
        .collect().foreach { r =>
          acc((r.getInt(0), r.getLong(1))) += r.getLong(2)
        }
      ()
    }.start()
    val rows = (0L until 100L).map(i =>
      Doc(i, ts("2024-01-01 10:00:00"), s"token$i shared words appear here token${i % 7}"))
    mem.addData(rows.take(60): _*); q.processAllAvailable()
    mem.addData(rows.drop(60): _*); q.processAllAvailable()
    q.stop()
    val whole = Sketches.cmsBuild(
        rows.toDF().select(explode(TextFunctions.tokens($"text")).as("term")),
        "term", depth = 4, width = 64)
      .as[(Int, Long, Long)].collect()
      .map { case (d, b, c) => (d, b) -> c }.toMap
    assert(acc.toMap === whole)
  }

  test("custom keyed state: running counts across micro-batches") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val mem = MemoryStream[Ev]
    val counts = Streams.runningCounts(
      mem.toDS().groupByKey(_.key))
    val q = counts.toDF("key", "n").writeStream.format("memory")
      .queryName("state_out").outputMode("update").start()
    mem.addData(Ev("a", ts("2024-01-01 10:00:00"), 1),
      Ev("a", ts("2024-01-01 10:01:00"), 1),
      Ev("b", ts("2024-01-01 10:00:30"), 1))
    q.processAllAvailable()
    mem.addData(Ev("a", ts("2024-01-01 10:05:00"), 1))
    q.processAllAvailable()
    // last emitted count per key reflects lifetime totals
    val last = spark.table("state_out").groupBy("key")
      .agg(org.apache.spark.sql.functions.max(col("n")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(last === Map("a" -> 3L, "b" -> 1L))
    q.stop()
  }

  test("streaming ingest lands in a ChronoDB table readable by the batch query path") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("sdb").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "hour"))
    db.createTable("stream_t")
    val mem = MemoryStream[ChronoRow]
    val q = Streams.ingestWriter(mem.toDF(), s"$root/stream_t",
      Files.createTempDirectory("sdb_cp").toString,
      lateness = "1 minute", trigger = Trigger.ProcessingTime(0)).start()
    mem.addData(
      ChronoRow("a", ts("2024-01-01 10:00:01"), Array[Byte](1)),
      ChronoRow("b", ts("2024-01-01 11:00:02"), Array[Byte](2)))
    q.processAllAvailable(); q.stop()
    // the batch facade reads what the stream wrote (memtable flush -> query)
    val out = db.query("stream_t",
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:59:59"))
    assert(out.select("key").as[String].collect().toSeq === Seq("a"))
    assert(db.stats("stream_t").numRows === 2)
  }

  test("S7 chronoSink: foreachBatch drives insert + inline compaction/cleanup") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("csink").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "hour",
      ttl = Some(7 * 24 * 3600L), compactFileThreshold = 1))
    db.createTable("s7")
    val mem = MemoryStream[ChronoRow]
    // pin both kept rows inside ONE hour bucket regardless of wall clock
    val now = System.currentTimeMillis()
    val hourStart = now - (now % 3600000L)
    val t1 = new Timestamp(hourStart + 2 * 60000L)
    val t2 = new Timestamp(hourStart + 3 * 60000L)
    val ancient = new Timestamp(now - 30L * 24 * 3600 * 1000L) // older than TTL
    val q = Streams.chronoSink(mem.toDF(), db, "s7",
      Files.createTempDirectory("csink_cp").toString,
      compactEvery = 2, trigger = Trigger.ProcessingTime(0)).start()
    mem.addData(ChronoRow("a", t1, Array[Byte](1)),
      ChronoRow("old", ancient, Array[Byte](9)))
    q.processAllAvailable() // batch 0: insert (TTL gate drops "old")
    mem.addData(ChronoRow("b", t2, Array[Byte](2)))
    q.processAllAvailable() // batch 1: insert, then compact + cleanup
    q.stop()
    val stats = db.stats("s7")
    assert(stats.numRows === 2) // ancient row dropped by the insert gate
    // both batches appended to the same bucket (2 files); the inline
    // maintenance pass rewrote it into one sorted file
    assert(stats.numFiles === 1)
    val keys = db.query("s7", new Timestamp(hourStart), new Timestamp(hourStart + 3599999L))
      .select("key").as[String].collect().sorted
    assert(keys.toSeq === Seq("a", "b"))
  }

  test("S7 chronoSink: sketch sidecars stay correct across micro-batches and inline compaction") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import org.apache.spark.sql.functions.{col, sum}
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("csink_sketch").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "hour",
      compactFileThreshold = 1, sketchCmsDepth = 4, sketchCmsWidth = 64))
    db.createTable("s7s")
    val now = System.currentTimeMillis()
    val hourStart = now - (now % 3600000L)
    def at(min: Int) = new Timestamp(hourStart + min * 60000L)
    val mem = MemoryStream[ChronoRow]
    val q = Streams.chronoSink(mem.toDF(), db, "s7s",
      Files.createTempDirectory("csink_sketch_cp").toString,
      compactEvery = 2, trigger = Trigger.ProcessingTime(0)).start()
    mem.addData((0 until 20).map(i => ChronoRow(s"k${i % 6}", at(i), Array[Byte](1))): _*)
    q.processAllAvailable() // batch 0: insert (sidecar rows appended)
    mem.addData((0 until 15).map(i => ChronoRow(s"k${i % 9}", at(20 + i), Array[Byte](2))): _*)
    q.processAllAvailable() // batch 1: insert, then inline compact folds sidecars
    q.stop()
    val full = (new Timestamp(hourStart), new Timestamp(hourStart + 3599999L))
    // HLL merge path == direct over what actually landed
    val direct = graft.operators.Sketches.hllDirect(
      db.query("s7s", full._1, full._2), Seq.empty, "key").head().getLong(0)
    assert(db.approxDistinctKeys("s7s", full._1, full._2) === direct)
    // CMS merge path == direct counter table
    val merged = db.cmsStats("s7s")
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val directCms = graft.operators.Sketches.cmsBuild(
        db.query("s7s", full._1, full._2), "key", depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === directCms)
    // the inline compaction really folded: one sidecar row per bucket
    assert(spark.read.parquet(s"$root/s7s/_stats")
      .groupBy(col("bucket")).count().filter(col("count") > 1).count() === 0)
    db.close()
  }

  test("S7 chronoSink: checkpoint recovery resumes without replaying committed batches") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("csink_rec").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "hour"))
    db.createTable("rec")
    val cp = Files.createTempDirectory("csink_rec_cp").toString
    val now = System.currentTimeMillis()
    val hourStart = now - (now % 3600000L)
    val t1 = new Timestamp(hourStart + 60000L)
    val t2 = new Timestamp(hourStart + 120000L)
    // first run: one batch, clean stop (same MemoryStream must back the
    // restart — checkpointed offsets are per-source-instance)
    val mem = MemoryStream[ChronoRow]
    val q1 = Streams.chronoSink(mem.toDF(), db, "rec", cp,
      compactEvery = 100, trigger = Trigger.ProcessingTime(0)).start()
    mem.addData(ChronoRow("a", t1, Array[Byte](1)))
    q1.processAllAvailable(); q1.stop()
    // second run from the SAME checkpoint: the committed batch is not
    // re-delivered to foreachBatch (the checkpoint is the WAL analog of
    // the reference's .tab recovery, db.go:291-350) — only new data lands
    mem.addData(ChronoRow("b", t2, Array[Byte](2)))
    val q2 = Streams.chronoSink(mem.toDF(), db, "rec", cp,
      compactEvery = 100, trigger = Trigger.ProcessingTime(0)).start()
    q2.processAllAvailable(); q2.stop()
    val keys = db.table("rec").select("key").as[String].collect().sorted
    assert(keys.toSeq === Seq("a", "b")) // exactly once each, no replay dup
  }

  test("transformWithState: per-key latest value with RocksDB state store") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
      val out = mem.toDS().map(e => (e.key, e.ts, e.value))
        .groupByKey(_._1)
        .transformWithState(new Streams.LatestValueProcessor,
          TimeMode.None(), OutputMode.Update())
      val q = out.toDF("key", "ts", "value").writeStream.format("memory")
        .queryName("tws_out").outputMode("update").start()
      mem.addData(Ev("a", ts("2024-01-01 10:00:00"), 1.0),
        Ev("a", ts("2024-01-01 10:02:00"), 2.0))
      q.processAllAvailable()
      // older row arrives later -> state keeps the newer value
      mem.addData(Ev("a", ts("2024-01-01 09:00:00"), 99.0))
      q.processAllAvailable()
      val rows = spark.table("tws_out").as[(String, Timestamp, Double)]
        .collect().sortBy(_._2.getTime)
      assert(rows.last === (("a", ts("2024-01-01 10:02:00"), 2.0)))
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("S6 stream-stream interval join matches rows within the window") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val joined = Streams.intervalJoin(
        clicks.toDF().withColumnRenamed("value", "click_v"),
        buys.toDF().withColumnRenamed("value", "buy_v"),
        keyCol = "key", tsCol = "ts",
        lateness = "1 minute", lookback = "10 MINUTES", lookahead = "0 SECONDS")
      .select(col("l.key").as("key"), col("l.ts").as("click_ts"),
        col("r.ts").as("buy_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    clicks.addData(Ev("u1", ts("2024-01-01 10:20:00"), 1))
    buys.addData(
      Ev("u1", ts("2024-01-01 10:15:00"), 1),  // within 10m lookback
      Ev("u1", ts("2024-01-01 09:00:00"), 1),  // too old
      Ev("u2", ts("2024-01-01 10:16:00"), 1))  // wrong key
    q.processAllAvailable()
    val rows = spark.table("ssj_out")
      .select("key", "buy_ts").as[(String, Timestamp)].collect()
    assert(rows.toSeq === Seq(("u1", ts("2024-01-01 10:15:00"))))
    q.stop()
  }

  test("S16 chronoUpsertSink: each micro-batch replaces touched keys; replay is idempotent") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("s16sink").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day"))
    try {
      db.createTable("st")
      val mem = MemoryStream[Ev]
      val cp = Files.createTempDirectory("s16cp").toString
      val chg = mem.toDF().select(col("key"), col("ts"),
        encode(format_number(col("value"), 1), "UTF-8").as("data"))
      val q = Streams.chronoUpsertSink(chg, db, "st", cp,
        trigger = Trigger.ProcessingTime(0)).start()
      mem.addData(
        Ev("a", ts("2024-01-01 10:00:00"), 1.0),
        Ev("a", ts("2024-01-02 10:00:00"), 2.0),
        Ev("b", ts("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable()
      mem.addData(
        Ev("a", ts("2024-01-03 10:00:00"), 4.0), // replaces BOTH a rows
        Ev("c", ts("2024-01-01 13:00:00"), 5.0)) // new key
      q.processAllAvailable()
      q.stop()
      def state(): Seq[(String, String)] = db.query("st",
          ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"))
        .select(col("key"), decode(col("data"), "UTF-8").as("v"))
        .as[(String, String)].collect().sortBy(identity).toSeq
      val afterStream = state()
      assert(afterStream === Seq(("a", "4.0"), ("b", "3.0"), ("c", "5.0")))
      // replaying the last batch (a crash between commit and checkpoint)
      // converges to the same state — the idempotence the sink relies on
      db.upsert("st", Seq(
        ChronoRow("a", ts("2024-01-03 10:00:00"), "4.0".getBytes("UTF-8")),
        ChronoRow("c", ts("2024-01-01 13:00:00"), "5.0".getBytes("UTF-8"))).toDS())
      assert(state() === afterStream)
    } finally db.close()
  }
}
