package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{QueryDef, Tables}
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("s1_stream_ingest", streamIngest, Some(
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin))
  )
}
