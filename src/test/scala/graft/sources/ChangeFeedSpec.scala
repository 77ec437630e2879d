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
