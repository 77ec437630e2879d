package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSuite
import graft.core.{ChronoConfig, ChronoDB, ChronoFs, ChronoRow, GranularityMismatchException, StreamRewriteException}

/** The streaming tail source's r16 hardening: the ENFORCED append-only
  * contract (a vanished seen file fails the query loudly), the bucket
  * high-watermark bound on per-trigger discovery and driver state, the
  * seen-log compaction that keeps restart recovery O(recent), and the
  * granularity-mismatch guards (batch relation + stream). */
class TailSourceSpec extends SparkSuite {

  private def mk(bucket: String = "day"): (ChronoDB, String) = {
    val root = Files.createTempDirectory("tailspec").toString
    (new ChronoDB(spark, ChronoConfig(root, bucket = bucket,
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      writersPerBucket = 1, compactFileThreshold = 1)), root)
  }

  private def rows(day: Int, tag: String, n: Int = 5) = (0 until n).map(i =>
    ChronoRow(s"$tag$i", Timestamp.valueOf(f"2024-04-$day%02d 10:00:00"),
      tag.getBytes("UTF-8")))

  private def src(root: String, wm: Option[Int] = None,
      compactEvery: Int = 64): ChronoStreamSource = {
    val (cfs, p) = ChronoFs.resolve(s"$root/ev",
      spark.sessionState.newHadoopConf())
    new ChronoStreamSource(spark, cfs, p,
      Files.createTempDirectory("tailmeta").toString, "day", wm, compactEvery)
  }

  test("catalog tail (readStream.table) sees the same rows as the path tail, incrementally") {
    val root = Files.createTempDirectory("cattail").toString
    val cat = s"ct${System.nanoTime() % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root)
    spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, v BIGINT)")
    def insertStage(lo: Int, hi: Int): Unit =
      spark.sql(s"INSERT INTO $cat.ev (key, ts, v) SELECT " +
        s"CAST(id AS STRING), timestamp_micros(1704067200000000 + id * 86400000000), id " +
        s"FROM range($lo, $hi)")
    insertStage(0, 4)
    val outP = Files.createTempDirectory("cattail_p").toString
    val outC = Files.createTempDirectory("cattail_c").toString
    val qPath = spark.readStream.format("chrono").load(s"$root/ev")
      .writeStream.format("parquet").option("path", outP)
      .option("checkpointLocation", Files.createTempDirectory("cp_p").toString)
      .start()
    val qCat = spark.readStream.table(s"$cat.ev")
      .writeStream.format("parquet").option("path", outC)
      .option("checkpointLocation", Files.createTempDirectory("cp_c").toString)
      .start()
    qPath.processAllAvailable(); qCat.processAllAvailable()
    val c1p = spark.read.parquet(outP).count()
    val c1c = spark.read.parquet(outC).count()
    assert(c1p === 4L && c1c === 4L)
    insertStage(4, 10)
    qPath.processAllAvailable(); qCat.processAllAvailable()
    qPath.stop(); qCat.stop()
    def canon(path: String) = spark.read.parquet(path)
      .selectExpr("key", "ts", "v", "bucket")
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    assert(canon(outC) === canon(outP))
    assert(canon(outC).size === 10)
    // both surfaces tailed incrementally (first drain < total)
    assert(c1c < 10L)
    spark.sql(s"DROP TABLE $cat.ev")
    spark.conf.unset(s"spark.sql.catalog.$cat")
    spark.conf.unset(s"spark.sql.catalog.$cat.dataDir")
    spark.conf.unset(s"spark.sql.catalog.$cat.bucket")
  }

  test("maxFilesPerTrigger paces a tail backlog on BOTH surfaces: capped batches, exact union") {
    val (db, root) = mk()
    try {
      db.createTable("ev")
      // 12 one-file commits (distinct days, one file each)
      (1 to 12).foreach(d => db.insertSeq("ev", rows(d, s"d$d", n = 1)))
      def drain(tag: String, reader: => org.apache.spark.sql.DataFrame)
          : (Long, Long) = {
        val out = Files.createTempDirectory(s"cap_$tag").toString
        val cp = Files.createTempDirectory(s"capcp_$tag").toString
        val q = reader.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp).start()
        q.processAllAvailable(); q.stop()
        import scala.jdk.CollectionConverters._
        val batches = java.nio.file.Files
          .list(java.nio.file.Paths.get(cp, "offsets")).iterator().asScala
          .count(_.getFileName.toString.forall(_.isDigit))
        (spark.read.parquet(out).count(), batches.toLong)
      }
      val (n1, b1) = drain("path", spark.readStream.format("chrono")
        .option("maxFilesPerTrigger", "3").load(s"$root/ev"))
      assert(n1 === 12L)
      assert(b1 === 4L) // 12 files / 3 per trigger
      // the V2 catalog surface takes the same option
      val cat = s"cap${System.nanoTime() % 1000000}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[ChronoCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root)
      spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
      try {
        val (n2, b2) = drain("cat", spark.readStream
          .option("maxFilesPerTrigger", "3").table(s"$cat.ev"))
        assert(n2 === 12L)
        assert(b2 === 4L)
      } finally {
        Seq("", ".dataDir", ".bucket").foreach(sfx =>
          spark.conf.unset(s"spark.sql.catalog.$cat$sfx"))
      }
    } finally db.close()
  }

  test("Trigger.AvailableNow on the catalog tail: capped batches, self-termination, query-start pin (r19)") {
    val (db, root) = mk()
    try {
      db.createTable("ev")
      (1 to 12).foreach(d => db.insertSeq("ev", rows(d, s"d$d", n = 1)))
      val cat = s"avn${System.nanoTime() % 1000000}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[ChronoCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root)
      spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
      try {
        val out = Files.createTempDirectory("avn_out").toString
        val cp = Files.createTempDirectory("avn_cp").toString
        val q = spark.readStream
          .option("maxFilesPerTrigger", "3").table(s"$cat.ev")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        // AvailableNow must TERMINATE on its own once the query-start
        // backlog drains — no stop() call here
        assert(q.awaitTermination(120000),
          "AvailableNow query must self-terminate")
        assert(spark.read.parquet(out).count() === 12L)
        // pacing survived: 12 files / cap 3 → 4 offset-log batches
        import scala.jdk.CollectionConverters._
        val batches = java.nio.file.Files
          .list(java.nio.file.Paths.get(cp, "offsets")).iterator().asScala
          .count(_.getFileName.toString.forall(_.isDigit))
        assert(batches === 4,
          s"12 files at cap 3 must drain in 4 capped batches, got $batches")
        // a file committed AFTER the run stays for the NEXT run: a
        // second AvailableNow pass picks up exactly the new file
        db.insertSeq("ev", rows(13, "late", n = 1))
        val q2 = spark.readStream
          .option("maxFilesPerTrigger", "3").table(s"$cat.ev")
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q2.awaitTermination(120000))
        assert(spark.read.parquet(out).count() === 13L)
        // the V1 PATH surface has the same true semantics (r19: the
        // source implements SupportsTriggerAvailableNow itself — the
        // engine's fetch-once wrapper would have stranded all but one
        // cap's worth): fresh checkpoint, 13 files / cap 3 → 5 batches
        val out2 = Files.createTempDirectory("avn_out2").toString
        val cp2 = Files.createTempDirectory("avn_cp2").toString
        val q3 = spark.readStream.format("chrono")
          .option("maxFilesPerTrigger", "3").load(s"$root/ev")
          .writeStream.format("parquet")
          .option("path", out2).option("checkpointLocation", cp2)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        assert(q3.awaitTermination(120000),
          "V1 path AvailableNow must self-terminate")
        assert(spark.read.parquet(out2).count() === 13L)
        val batches2 = java.nio.file.Files
          .list(java.nio.file.Paths.get(cp2, "offsets")).iterator().asScala
          .count(_.getFileName.toString.forall(_.isDigit))
        assert(batches2 === 5,
          s"13 files at cap 3 → 5 capped batches, got $batches2")
      } finally {
        Seq("", ".dataDir", ".bucket").foreach(sfx =>
          spark.conf.unset(s"spark.sql.catalog.$cat$sfx"))
      }
    } finally db.close()
  }

  test("catalog tail enforces the append-only contract (rewrite under the tail fails loudly)") {
    val root = Files.createTempDirectory("cattail2").toString
    val cat = s"ct2${System.nanoTime() % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root)
    spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, v BIGINT)")
    // fragment one bucket past the compact threshold (fullStats default
    // 4) so compact() has a victim
    (0 until 5).foreach(i => spark.sql(
      s"INSERT INTO $cat.ev (key, ts, v) VALUES " +
        s"('k$i', TIMESTAMP '2024-04-01 10:0$i:00', $i)"))
    val out = Files.createTempDirectory("cattail2_out").toString
    val q = spark.readStream.table(s"$cat.ev")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", Files.createTempDirectory("cp2").toString)
      .start()
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() === 5L)
    assert(spark.sql(s"CALL $cat.system.compact('ev')").head().getLong(0) === 1L)
    spark.sql(s"INSERT INTO $cat.ev (key, ts, v) VALUES " +
      "('k9', TIMESTAMP '2024-04-02 10:00:00', 9)")
    val e = intercept[Exception] { q.processAllAvailable() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[StreamRewriteException]) ||
      e.getMessage.contains("rewrote"))
    q.stop()
    spark.conf.unset(s"spark.sql.catalog.$cat")
    spark.conf.unset(s"spark.sql.catalog.$cat.dataDir")
    spark.conf.unset(s"spark.sql.catalog.$cat.bucket")
  }

  test("append-only contract enforced: compaction under a live tail fails loudly") {
    val (db, root) = mk()
    try {
      db.createTable("ev")
      db.insertSeq("ev", rows(1, "a"))
      val s = src(root)
      assert(s.getOffset.isDefined)
      // two more batches into the same bucket → over threshold → compact
      // rewrites the bucket's files while the tail holds them as seen
      db.insertSeq("ev", rows(1, "b"))
      db.insertSeq("ev", rows(1, "c"))
      assert(s.getOffset.isDefined)
      assert(db.compact("ev") === 1)
      val e = intercept[StreamRewriteException](s.getOffset)
      assert(e.getMessage.contains("compact"))
    } finally db.close()
  }

  test("bucket high-watermark bounds discovery: below-watermark files are not emitted, recent ones are") {
    val (db, root) = mk()
    try {
      db.createTable("ev")
      db.insertSeq("ev", rows(10, "a")) // bucket 2024-04-10
      val s = src(root, wm = Some(2))   // watch [maxSeen-2, maxSeen]
      val first = s.getOffset
      assert(first.isDefined)
      // a LATE file lands 5 buckets below the watermark → invisible
      // (the documented late-data contract), not re-emitted, no error
      db.insertSeq("ev", rows(3, "late"))
      assert(s.getOffset === first)
      // a file inside the window still arrives
      db.insertSeq("ev", rows(9, "b"))
      val second = s.getOffset
      assert(second.isDefined && second != first)
      // and compaction of the BELOW-watermark bucket is invisible too
      // (discovery never reads below the watermark — no false rewrite
      // alarm, no re-emit)
      db.insertSeq("ev", rows(3, "late2"))
      db.compact("ev")
      assert(s.getOffset === second)
    } finally db.close()
  }

  test("seen-log compaction folds committed ordinals; restart recovers from the snapshot") {
    val (db, root) = mk()
    try {
      db.createTable("ev")
      val meta = Files.createTempDirectory("tailmeta").toString
      val (cfs, p) = ChronoFs.resolve(s"$root/ev",
        spark.sessionState.newHadoopConf())
      val s = new ChronoStreamSource(spark, cfs, p, meta, "day", None, 3)
      (1 to 4).foreach { d =>
        db.insertSeq("ev", rows(d, s"t$d"))
        val off = s.getOffset.get
        s.commit(off)
      }
      val (mfs, logDir) = ChronoFs.resolve(s"$meta/chrono-seen",
        spark.sessionState.newHadoopConf())
      val names = mfs.list(logDir).map(_.getPath.getName)
      // ordinals 0..2 folded into a .compact at the threshold; later
      // ordinals keep their per-ordinal files
      assert(names.count(_.endsWith(".compact")) === 1)
      assert(names.count(_.forall(_.isDigit)) < 4)
      // a NEW source over the same metadata dir (restart) must replay
      // the snapshot + tail: nothing re-emits, new data still arrives
      val s2 = new ChronoStreamSource(spark, cfs, p, meta, "day", None, 3)
      val restartOff = s2.getOffset
      db.insertSeq("ev", rows(5, "t5"))
      assert(s2.getOffset != restartOff)
    } finally db.close()
  }

  test("e2e readStream with watermarkBuckets + seenLogCompactEvery options") {
    val (db, root) = mk()
    val out = Files.createTempDirectory("tailout").toString
    val cp = Files.createTempDirectory("tailcp").toString
    try {
      db.createTable("ev")
      db.insertSeq("ev", rows(10, "a"))
      val q = spark.readStream.format("chrono")
        .option("watermarkBuckets", "2")
        .option("seenLogCompactEvery", "2")
        .load(s"$root/ev")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .start()
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 5)
      // recent bucket arrives; a below-watermark straggler does not
      db.insertSeq("ev", rows(9, "b"))
      db.insertSeq("ev", rows(3, "late"))
      q.processAllAvailable()
      q.stop()
      assert(spark.read.parquet(out).count() === 10)
    } finally db.close()
  }

  test("ALTER ADD COLUMN mid-tail: pinned schema until restart, NULL-filled after (spec-pinned, VERDICT r18 #6)") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("tailalter").toString
    val cp = Files.createTempDirectory("tailalter_cp").toString
    val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      writersPerBucket = 1))
    try {
      db.createTable("ev", StructType(Seq(
        StructField("key", StringType), StructField("ts", TimestampType),
        StructField("v", LongType))))
      def ins(k: String, v: Long, w: Option[Long]): Unit = {
        val base = spark.createDataFrame(java.util.List.of(
          org.apache.spark.sql.Row(k, Timestamp.valueOf("2024-04-01 10:00:00"),
            v, w.map(Long.box).orNull)),
          StructType(Seq(StructField("key", StringType),
            StructField("ts", TimestampType), StructField("v", LongType),
            StructField("w", LongType))))
        db.insertFrame("ev", if (w.isDefined) base else base.drop("w"))
      }
      val seen = scala.collection.mutable.ArrayBuffer
        .empty[(Seq[String], Seq[(String, Option[Long])])]
      def startQ() = spark.readStream.format("chrono").load(s"$root/ev")
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val cols = b.schema.fieldNames.toSeq
          val rows = b.collect().map(r => (r.getString(0),
            if (cols.contains("w")) Option(r.getAs[java.lang.Long]("w"))
              .map(_.longValue) else None)).toSeq
          seen.synchronized { seen += ((cols, rows)) }; ()
        }.start()
      ins("a", 1L, None)
      val q1 = startQ()
      q1.processAllAvailable()
      // schema pinned at source construction (the V1 Source contract)
      db.addColumn("ev", StructField("w", LongType))
      ins("b", 2L, Some(5L))
      q1.processAllAvailable()
      q1.stop()
      assert(seen.synchronized(seen.map(_._1)).forall(!_.contains("w")),
        "a running tail keeps its pinned (pre-ALTER) schema")
      assert(seen.synchronized(seen.flatMap(_._2)).map(_._1).toSet ===
        Set("a", "b"), "post-ALTER files still arrive (old columns)")
      seen.synchronized(seen.clear())
      // restart re-resolves: the added column appears; the already-
      // emitted files stay consumed (seen-log), the new file carries w
      ins("c", 3L, Some(7L))
      val q2 = startQ()
      q2.processAllAvailable()
      q2.stop()
      val after = seen.synchronized(seen.toSeq)
      assert(after.flatMap(_._1).contains("w"),
        "a restarted tail serves the widened schema")
      assert(after.flatMap(_._2).toMap === Map("c" -> Some(7L)))
      // a FRESH tail over the whole table NULL-fills pre-ALTER files
      seen.synchronized(seen.clear())
      val cp2 = Files.createTempDirectory("tailalter_cp2").toString
      val q3 = spark.readStream.format("chrono").load(s"$root/ev")
        .writeStream.option("checkpointLocation", cp2)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen += ((b.schema.fieldNames.toSeq,
            b.collect().map(r => (r.getString(0),
              Option(r.getAs[java.lang.Long]("w")).map(_.longValue)))
              .toSeq)) }
          ()
        }.start()
      q3.processAllAvailable()
      q3.stop()
      assert(seen.synchronized(seen.flatMap(_._2)).toMap ===
        Map("a" -> None, "b" -> Some(5L), "c" -> Some(7L)),
        "pre-ALTER files NULL-fill the added column on a fresh tail")
    } finally db.close()
  }

  test("typed tables stream in BOTH directions: sink declares the schema, tail serves it") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("typedstream").toString
    val landing = Files.createTempDirectory("typedlanding")
    val out = Files.createTempDirectory("typedout").toString
    // a TYPED landing batch: doc_id/ts/text/score, no key, no data
    import spark.implicits._
    Seq((1L, Timestamp.valueOf("2024-04-01 10:00:00"), "alpha", 0.5),
        (2L, Timestamp.valueOf("2024-04-02 11:00:00"), "beta", 0.9))
      .toDF("doc_id", "ts", "text", "score")
      .write.parquet(landing.toString + "/b0")
    val sink = spark.readStream
      .schema("doc_id BIGINT, ts TIMESTAMP, text STRING, score DOUBLE")
      .parquet(landing.toString + "/*")
      .writeStream.format("chrono")
      .option("path", s"$root/docs").option("bucket", "day")
      .option("checkpointLocation", Files.createTempDirectory("cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sink.awaitTermination()
    // the sink DECLARED the stream's typed schema for the new table
    val back = spark.read.format("chrono").load(s"$root/docs")
    assert(back.columns.toSeq === Seq("doc_id", "ts", "text", "score", "bucket"))
    assert(back.count() === 2)
    // and the tail source serves the same declared columns
    val tail = spark.readStream.format("chrono").load(s"$root/docs")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", Files.createTempDirectory("cp2").toString)
      .start()
    tail.processAllAvailable()
    tail.stop()
    val tailed = spark.read.parquet(out)
    assert(tailed.columns.toSet ===
      Set("doc_id", "ts", "text", "score", "bucket"))
    assert(tailed.select("text").as[String].collect().sorted ===
      Array("alpha", "beta"))
  }

  test("granularity mismatch fails loudly on batch reads and streams") {
    val (db, root) = mk("day")
    try {
      db.createTable("ev")
      db.insertSeq("ev", rows(1, "a"))
      // batch: explicit wrong option rejected against on-disk labels
      intercept[GranularityMismatchException] {
        spark.read.format("chrono").option("granularity", "hour")
          .load(s"$root/ev").count()
      }
      // stream: a wrong declared granularity fails at first discovery
      val (cfs, p) = ChronoFs.resolve(s"$root/ev",
        spark.sessionState.newHadoopConf())
      val s = new ChronoStreamSource(spark, cfs, p,
        Files.createTempDirectory("tailmeta").toString, "hour")
      intercept[GranularityMismatchException](s.getOffset)
    } finally db.close()
  }
}
