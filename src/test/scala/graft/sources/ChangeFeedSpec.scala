package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSuite
import graft.core.{ChronoConfig, ChronoDB, ChronoRow}

/** Streaming CHANGE FEED ([[ChronoChangeFeedSource]]): offsets are
  * history versions, batches are per-commit row deltas — DML and
  * maintenance arrive ON the stream instead of killing it (the plain
  * tail's StreamRewriteException contract), and replay is
  * deterministic from the offset log alone (commits immutable, no
  * source-side state). */
class ChangeFeedSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("DML and compaction arrive on the feed: updates as pairs, compact nets out, restart resumes") {
    val dir = Files.createTempDirectory("cfeed").toString
    val out = Files.createTempDirectory("cfeed_out").toString
    val cp = Files.createTempDirectory("cfeed_cp").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      compactFileThreshold = 1, trashGraceMs = 3600000L))
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1)),
        ChronoRow("b", ts("2024-03-02 10:00:00"), Array(2))))   // v1
      def startQ() = spark.readStream.format("chrono")
        .option("changeFeed", "true").load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .start()
      def feed(): Seq[(String, String, Long)] =
        spark.read.parquet(out)
          .select(col("key"), col("_change_type"), col("_commit_version"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .sortBy(x => (x._3, x._1, x._2)).toSeq
      val q1 = startQ()
      q1.processAllAvailable()
      assert(feed() === Seq(("a", "insert", 1L), ("b", "insert", 1L)))
      // an UPDATE arrives as its delete+insert pair
      db.updateWhere("t", Seq("data" -> lit(Array[Byte](9))),
        col("key") === "a")                                      // v2
      q1.processAllAvailable()
      assert(feed().filter(_._3 == 2L) ===
        Seq(("a", "delete", 2L), ("a", "insert", 2L)))
      q1.stop()
      // mutations while the stream is DOWN; restart resumes from the
      // offset log alone (no source-side state)
      db.insertSeq("t", Seq(
        ChronoRow("c", ts("2024-03-03 10:00:00"), Array(3))))   // v3
      db.deleteKeys("t", Seq("b"))                               // v4
      val q2 = startQ()
      q2.processAllAvailable()
      assert(feed().filter(_._3 >= 3L) ===
        Seq(("c", "insert", 3L), ("b", "delete", 4L)).sortBy(x => (x._3, x._1)))
      // COMPACTION emits nothing: its commit's adds and removes carry
      // identical rows that net out — the feed survives the very verb
      // that kills the file tail
      db.insertSeq("t", Seq(
        ChronoRow("a2", ts("2024-03-01 11:00:00"), Array(4))))  // v5
      q2.processAllAvailable()
      val before = feed()
      assert(db.compact("t") >= 1)                               // v6
      q2.processAllAvailable()
      assert(feed() === before)
      q2.stop()
      // the batch verb agrees with the stream's accumulation
      val batch = db.changesBetween("t", 0, 6)
        .select(col("key"), col("_change_type"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      val net = Seq(("a", "insert"), ("a2", "insert"), ("c", "insert")).sorted
      assert(batch === net)
    } finally db.close()
  }

  test("maxCommitsPerTrigger: a 100-commit backlog drains in exactly 10 capped batches whose union equals changesBetween") {
    val dir = Files.createTempDirectory("cfeed_cap").toString
    val out = Files.createTempDirectory("cfeed_cap_out").toString
    val cp = Files.createTempDirectory("cfeed_cap_cp").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      trashGraceMs = 3600000L))
    try {
      db.createTable("t")
      (1 to 100).foreach(i => db.insertSeq("t", Seq(
        ChronoRow(s"k$i", ts("2024-03-01 10:00:00"), Array(i.toByte)))))
      val q = spark.readStream.format("chrono")
        .option("changeFeed", "true")
        .option("maxCommitsPerTrigger", "10")
        .load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .start()
      q.processAllAvailable()
      q.stop()
      // exactly 10 batches, each reserving exactly 10 versions — the
      // offset log is the ground truth for pacing
      import scala.jdk.CollectionConverters._
      val offDir = java.nio.file.Paths.get(cp, "offsets")
      val entries = java.nio.file.Files.list(offDir).iterator().asScala
        .filter(_.getFileName.toString.forall(_.isDigit))
        .map { p =>
          val lines = java.nio.file.Files.readAllLines(p).asScala
          (p.getFileName.toString.toLong, lines.last.trim.toLong)
        }.toSeq.sortBy(_._1)
      assert(entries.map(_._1) === (0L to 9L))
      assert(entries.map(_._2) === (1L to 10L).map(_ * 10L))
      // the capped union equals the uncapped batch verb
      val got = spark.read.parquet(out)
        .select(col("key"), col("_change_type"), col("_commit_version"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(_._3).toSeq
      assert(got.size === 100)
      assert(got.forall(_._2 == "insert"))
      assert(got.map(_._3) === (1L to 100L))
      val batch = db.changesBetween("t", 0, 100)
        .select(col("key"), col("_change_type"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(batch === got.map(g => (g._1, g._2)).sorted)
    } finally db.close()
  }

  test("Trigger.AvailableNow on the V1 feed: engine wrapper + the cap — paced batches, self-termination (spec-pinned)") {
    val dir = Files.createTempDirectory("cfeed_avn").toString
    val out = Files.createTempDirectory("cfeed_avn_out").toString
    val cp = Files.createTempDirectory("cfeed_avn_cp").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      trashGraceMs = 3600000L))
    try {
      db.createTable("t")
      (1 to 10).foreach(i => db.insertSeq("t", Seq(
        ChronoRow(s"k$i", ts("2024-03-01 10:00:00"), Array(i.toByte)))))
      val q = spark.readStream.format("chrono")
        .option("changeFeed", "true")
        .option("maxCommitsPerTrigger", "3")
        .load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // V1 sources ride the engine's AvailableNow wrapper; the pinned
      // contract: the query SELF-TERMINATES with the whole query-start
      // backlog delivered, and the source's own cap still paces the
      // offset log (no single 10-commit mega-batch)
      assert(q.awaitTermination(120000),
        "AvailableNow feed must self-terminate")
      assert(spark.read.parquet(out).count() === 10L)
      import scala.jdk.CollectionConverters._
      val ends = java.nio.file.Files
        .list(java.nio.file.Paths.get(cp, "offsets")).iterator().asScala
        .filter(_.getFileName.toString.forall(_.isDigit))
        .map(p => java.nio.file.Files.readAllLines(p).asScala.last.trim.toLong)
        .toSeq.sorted
      assert(ends.nonEmpty && ends.last === 10L)
      val spans = (0L +: ends).sliding(2).map(w => w(1) - w(0)).toSeq
      assert(spans.forall(_ <= 3L),
        s"every batch must respect the cap under AvailableNow: $spans")
    } finally db.close()
  }

  test("restart with the hwm LEADING the offset log serves the reservation as-is — never 2x the cap (ADVICE r18)") {
    val dir = Files.createTempDirectory("cfeed_lead").toString
    val meta = Files.createTempDirectory("cfeed_lead_meta").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      trashGraceMs = 3600000L))
    try {
      db.createTable("t")
      (1 to 10).foreach(i => db.insertSeq("t", Seq(
        ChronoRow(s"k$i", ts("2024-03-01 10:00:00"), Array(i.toByte)))))   // head = 10
      val (cfs, root) = graft.core.ChronoFs.resolve(s"$dir/t",
        spark.sessionState.newHadoopConf())
      // simulate the crash window: reservation hwm persisted at 4, the
      // engine's offset log never got it (its recovered position is 1)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(meta, "chrono-feed-hwm"), "4")
      def offsetOf(src: ChronoChangeFeedSource): Long =
        src.getOffset.map(o =>
          o.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime
            .LongOffset].offset).getOrElse(-1L)
      val src = new ChronoChangeFeedSource(spark, cfs, root, "day",
        startingVersion = 0L, metadataPath = meta,
        maxCommitsPerTrigger = Some(3))
      // first getOffset after restart: serve the recovered reservation
      // (4) — NOT 4+3: the engine's first batch (1, 4] then spans at
      // most one cap, where the old shape reserved (1, 7]
      assert(offsetOf(src) === 4L)
      // once the lead is consumed, normal cap-paced advance resumes
      assert(offsetOf(src) === 7L)
      assert(offsetOf(src) === 10L)
      assert(offsetOf(src) === 10L) // head reached — no over-reserve
      // a FRESH stream (no recovered hwm) advances by the cap at once
      val meta2 = Files.createTempDirectory("cfeed_lead_meta2").toString
      val fresh = new ChronoChangeFeedSource(spark, cfs, root, "day",
        startingVersion = 0L, metadataPath = meta2,
        maxCommitsPerTrigger = Some(3))
      assert(offsetOf(fresh) === 3L)
    } finally db.close()
  }

  test("ALTER ADD COLUMN mid-feed: old schema until restart, NULL-filled after (spec-pinned, VERDICT r18 #6)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("cfeed_alter").toString
    val cp = Files.createTempDirectory("cfeed_alter_cp").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
      trashGraceMs = 3600000L))
    try {
      db.createTable("t", StructType(Seq(
        StructField("key", StringType), StructField("ts", TimestampType),
        StructField("v", LongType))))
      def ins(k: String, v: Long, w: Option[Long]): Unit = {
        val base = spark.createDataFrame(java.util.List.of(
          org.apache.spark.sql.Row(k, ts("2024-03-01 10:00:00"), v,
            w.map(Long.box).orNull)),
          StructType(Seq(StructField("key", StringType),
            StructField("ts", TimestampType), StructField("v", LongType),
            StructField("w", LongType))))
        db.insertFrame("t", if (w.isDefined) base else base.drop("w"))
      }
      // batches land here with the schema EACH SOURCE INSTANCE resolved
      val seen = scala.collection.mutable.ArrayBuffer
        .empty[(Seq[String], Seq[(String, Option[Long])])]
      def startQ() = spark.readStream.format("chrono")
        .option("changeFeed", "true").load(s"$dir/t")
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val cols = b.schema.fieldNames.toSeq
          val rows = b.collect().map(r => (r.getString(0),
            if (cols.contains("w")) Option(r.getAs[java.lang.Long]("w"))
              .map(_.longValue) else None)).toSeq
          seen.synchronized { seen += ((cols, rows)) }; ()
        }.start()
      ins("a", 1L, None)                                     // v1
      val q1 = startQ()
      q1.processAllAvailable()
      // V1 Source contract: the schema is PINNED at source construction
      db.addColumn("t", StructField("w", LongType))
      ins("b", 2L, Some(5L))                                 // v2
      q1.processAllAvailable()
      q1.stop()
      val (colsBefore, rowsBefore) = seen.synchronized {
        (seen.map(_._1).toSeq, seen.flatMap(_._2).toSeq)
      }
      assert(colsBefore.forall(!_.contains("w")),
        s"a running feed must keep its pinned (pre-ALTER) schema: $colsBefore")
      assert(rowsBefore.map(_._1).toSet === Set("a", "b"),
        "the post-ALTER commit still ARRIVES (old columns only)")
      seen.synchronized(seen.clear())
      // restart: the new source instance re-resolves → `w` appears,
      // and pre-ALTER files serve NULL in it
      ins("c", 3L, Some(7L))                                 // v3
      val q2 = startQ()
      q2.processAllAvailable()
      q2.stop()
      val after = seen.synchronized(seen.toSeq)
      assert(after.flatMap(_._1).contains("w"),
        "a restarted feed serves the widened schema")
      assert(after.flatMap(_._2).toMap === Map("c" -> Some(7L)),
        "only the unconsumed commit re-emits, with the new column")
      // a FRESH feed over the whole history NULL-fills pre-ALTER rows
      seen.synchronized(seen.clear())
      val cp2 = Files.createTempDirectory("cfeed_alter_cp2").toString
      val q3 = spark.readStream.format("chrono")
        .option("changeFeed", "true").load(s"$dir/t")
        .writeStream.option("checkpointLocation", cp2)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getString(0),
            Option(r.getAs[java.lang.Long]("w")).map(_.longValue))).toSeq
          seen.synchronized { seen += ((b.schema.fieldNames.toSeq, rows)) }
          ()
        }.start()
      q3.processAllAvailable()
      q3.stop()
      val replay = seen.synchronized(seen.flatMap(_._2).toMap)
      assert(replay === Map("a" -> None, "b" -> Some(5L), "c" -> Some(7L)),
        s"pre-ALTER rows must NULL-fill the added column: $replay")
    } finally db.close()
  }

  test("change feed refuses a table whose writer disabled history (would hang forever)") {
    val dir = Files.createTempDirectory("cfeed3").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      history = false))
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1))))
      val e = intercept[Exception] {
        spark.readStream.format("chrono")
          .option("changeFeed", "true").load(s"$dir/t")
          .writeStream.format("memory").queryName("cf_nohist")
          .option("checkpointLocation",
            Files.createTempDirectory("cfeed3_cp").toString)
          .start()
          .processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("no version history")))
    } finally db.close()
  }

  test("catalog path: readStream.option(changeFeed).table resolves to the SAME feed source (rule rewrite), DML arrives with versions") {
    val dir = Files.createTempDirectory("cfeed_cat").toString
    val out = Files.createTempDirectory("cfeed_cat_out").toString
    val cp = Files.createTempDirectory("cfeed_cat_cp").toString
    val cat = s"cfc${System.nanoTime() % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.dataDir", dir)
    spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
    spark.conf.set(s"spark.sql.catalog.$cat.trashGrace", "3600")
    try {
      spark.sql(s"CREATE TABLE $cat.t (key STRING, ts TIMESTAMP, v BIGINT)")
      spark.sql(s"INSERT INTO $cat.t (key, ts, v) VALUES " +
        "('a', TIMESTAMP '2024-03-01 10:00:00', 1), " +
        "('b', TIMESTAMP '2024-03-02 10:00:00', 2)")          // v1
      val q = spark.readStream
        .option("changeFeed", "true")
        .option("maxCommitsPerTrigger", "1")
        .table(s"$cat.t")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .start()
      q.processAllAvailable()
      spark.sql(s"DELETE FROM $cat.t WHERE key = 'a'")         // v2
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out)
        .select(col("key"), col("_change_type"), col("_commit_version"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(x => (x._3, x._1, x._2)).toSeq
      assert(got === Seq(("a", "insert", 1L), ("b", "insert", 1L),
        ("a", "delete", 2L)))
      // a snapshot relation refuses the feed loudly
      val e = intercept[Exception] {
        spark.readStream.option("changeFeed", "true")
          .table(s"$cat.t VERSION AS OF 1")
      }
      assert(e.getMessage != null)
      spark.sql(s"DROP TABLE $cat.t")
    } finally {
      Seq("", ".dataDir", ".bucket", ".trashGrace").foreach(s =>
        spark.conf.unset(s"spark.sql.catalog.$cat$s"))
    }
  }

  test("a feed lagging past the grace window fails loudly at batch planning") {
    val dir = Files.createTempDirectory("cfeed2").toString
    val out = Files.createTempDirectory("cfeed2_out").toString
    val cp = Files.createTempDirectory("cfeed2_cp").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      trashGraceMs = 300L))
    try {
      db.createTable("t")
      db.insertSeq("t", Seq(
        ChronoRow("a", ts("2024-03-01 10:00:00"), Array(1))))   // v1
      db.deleteKeys("t", Seq("a"))                               // v2
      Thread.sleep(500)
      assert(db.vacuumOrphans("t", horizonMs = 300) >= 1)
      val q = spark.readStream.format("chrono")
        .option("changeFeed", "true").load(s"$dir/t")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .start()
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(2000)
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c => c.getMessage != null &&
        (c.getMessage.contains("no longer readable") ||
          c.getMessage.contains("no retained checkpoint"))))
      q.stop()
    } finally db.close()
  }
}
