package graft.streaming

import graft.SparkSuite
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the EXACT late-row filter boundary the declared streaming oracles
  * (s3b_watermark_drop, s5b_stream_dedup in StreamingQueries) encode in
  * DuckDB SQL: a stateful operator drops a row iff its event-time column
  * (dedup) / its window END (aggregation) is `<=` the current watermark,
  * where the watermark is max-seen-event-time minus the delay, evaluated
  * with the value carried over from the PREVIOUS micro-batch. If a Spark
  * upgrade ever flips `<=` to `<`, these asserts fail before the oracle
  * silently diverges on a boundary-tied fixture.
  */
class WatermarkBoundarySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedup drops a row iff its event time <= watermark (strict-greater survives)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dd = Streams.dedup(mem.toDF(), "ts", "10 minutes", Seq("key"))
    val q = dd.writeStream.format("memory").queryName("wb_dd")
      .outputMode("append").start()
    mem.addData(Ev("anchor", ts("2024-01-01 10:00:00"), 1))
    q.processAllAvailable()
    // watermark is now exactly 09:50:00.000
    mem.addData(
      Ev("eq", ts("2024-01-01 09:50:00"), 1),
      Ev("lt", Timestamp.valueOf("2024-01-01 09:49:59.999"), 1),
      Ev("gt", Timestamp.valueOf("2024-01-01 09:50:00.001"), 1))
    q.processAllAvailable()
    val kept = spark.table("wb_dd").select("key").as[String].collect().sorted
    assert(kept.toSeq === Seq("anchor", "gt")) // eq AND lt dropped
    q.stop()
  }

  test("windowed agg drops a row iff its window END <= watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = Streams.windowedAgg(mem.toDF(), "ts", "5 minutes", None,
      lateness = "10 minutes", keys = Seq(col("key")),
      aggs = Seq(count(lit(1)).as("n")))
    val q = agg.writeStream.format("memory").queryName("wb_agg")
      .outputMode("append").start()
    mem.addData(Ev("anchor", ts("2024-01-01 10:00:00"), 1))
    q.processAllAvailable()
    // watermark 09:50:00.000
    mem.addData(
      Ev("end_eq", ts("2024-01-01 09:46:00"), 1), // window [09:45,09:50) end==W
      Ev("end_lt", ts("2024-01-01 09:41:00"), 1), // end 09:45 < W
      Ev("end_gt", ts("2024-01-01 09:51:00"), 1)) // end 09:55 > W
    q.processAllAvailable()
    // flush far forward so every surviving window finalizes (append mode)
    mem.addData(Ev("flush", ts("2024-01-01 12:00:00"), 1))
    q.processAllAvailable()
    val wins = spark.table("wb_agg")
      .select(col("key"), col("window.start").cast("string"))
      .as[(String, String)].collect().sorted.toSeq
    // end_eq's window (end == watermark) was dropped; end_gt's survived;
    // the flush row's own window is past the final watermark, never emitted
    assert(wins === Seq(
      ("anchor", "2024-01-01 10:00:00"),
      ("end_gt", "2024-01-01 09:50:00")))
    q.stop()
  }
}
