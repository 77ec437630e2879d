package graft.core

import graft.SparkSuite
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** End-to-end: fixture events ingested through the ChronoDB facade, then
  * range-queried — parity with filtering the source directly (the
  * reference's whole live query surface, db.go:155-162). */
class ChronoDBIntegrationSpec extends SparkSuite {
  import spark.implicits._

  test("events fixture through ChronoDB: range query parity with direct filter") {
    val db = new ChronoDB(spark,
      ChronoConfig(Files.createTempDirectory("integ").toString, bucket = "day"))
    db.createTable("events")

    val src = Tables.t(spark, sf(), "events")
    val rows = src.select(
      col("user_id").cast("string").as("key"),
      col("ts"),
      col("props").cast("binary").as("data")).as[ChronoRow]
    db.insert("events", rows)

    val s = Timestamp.valueOf("2024-01-10 00:00:00")
    val e = Timestamp.valueOf("2024-01-20 00:00:00")
    val got = db.query("events", s, e).count()
    val want = src.filter(col("ts").between(lit(s), lit(e))).count()
    assert(got === want)
    assert(got > 0)

    val st = db.stats("events")
    assert(st.numRows === src.count())
    // day bucketing over a ~30-day fixture → ~30 partitions
    assert(st.numFiles >= 28)
  }
}
