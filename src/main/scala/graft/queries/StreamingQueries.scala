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
  * plain batch read, which is exactly what the DuckDB oracle checks. */
object StreamingQueries {

  /** S1: file-source stream → watermark → time-bucketed parquet sink
    * (the reference's ingest path, table.go:78-119, done the Spark way),
    * then read the sink back. Oracle: the batch content of events. */
  def streamIngest(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staticSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file streaming source wants a landing DIRECTORY — stage the
    // fixture file into one (a real deployment tails a landing dir)
    val landing = Files.createTempDirectory("s1_landing")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      landing.resolve("events.parquet"))
    val src = spark.readStream
      .schema(staticSchema)
      .parquet(landing.toString)
    val rows = src.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
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

  /** S6 (batch-checkable form): the stream-stream interval join run on
    * batch inputs — `withWatermark` is eliminated by the analyzer in
    * batch mode, so this drives the EXACT library code path
    * (Streams.intervalJoin) whose streaming behavior StreamsSpec
    * checks, and the oracle verifies the join predicate itself. */
  def intervalJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
    Streams.intervalJoin(clicks, purchases, "user_id", "ts",
        lateness = "10 minutes", lookback = "1 hour", lookahead = "1 hour")
      .select(col("l.event_id").as("click_id"),
        col("l.user_id").as("user_id"), col("l.ts").as("c_ts"),
        col("r.event_id").as("purchase_id"), col("r.ts").as("p_ts"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("s6_interval_join", intervalJoinBatch, Some(
      """SELECT c.event_id AS click_id, c.user_id, c.ts AS c_ts,
        |       p.event_id AS purchase_id, p.ts AS p_ts
        |FROM events c JOIN events p ON p.user_id = c.user_id
        | AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts + INTERVAL 1 HOUR
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |ORDER BY click_id, purchase_id""".stripMargin)),
    QueryDef("s1_stream_ingest", streamIngest, Some(
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin)),
    QueryDef("s2b_sliding_window", slidingWindows, Some(
      s"""WITH x AS (
         |  SELECT event_type, value,
         |         date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS win_start
         |  FROM events, generate_series(0, 1) g(k))
         |SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end, event_type,
         |       COUNT(*) AS n_events, ${Det.dsumSql("value")} AS sum_value
         |FROM x GROUP BY win_start, event_type
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
