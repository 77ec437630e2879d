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

  test("hot bucket is written by multiple salted tasks; semantics unchanged") {
    val root = Files.createTempDirectory("salted")
    val db = new ChronoDB(spark,
      ChronoConfig(root.toString, bucket = "hour", writersPerBucket = 4,
        compactFileThreshold = 1))
    db.createTable("t")
    // 200 rows all inside ONE hour bucket — the ingest-skew shape
    val rows = (1 to 200).map { i =>
      ChronoRow(s"k$i", Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:${i % 60}%02d"),
        Array[Byte](i.toByte))
    }
    db.insertSeq("t", rows)
    val bucketDir = root.resolve("t").resolve("bucket=2024-01-01-10")
    val files = Files.list(bucketDir)
    val n = try files.filter(_.toString.endsWith(".parquet")).count()
      finally files.close()
    assert(n > 1, s"expected >1 salted writer file in the hot bucket, got $n")
    // query and cleanup semantics are independent of the physical split
    val got = db.query("t", Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-01-01 11:00:00")).count()
    assert(got === 200)
    // compact folds the salted files back to one
    assert(db.compact("t") === 1)
    val files2 = Files.list(bucketDir)
    val n2 = try files2.filter(_.toString.endsWith(".parquet")).count()
      finally files2.close()
    assert(n2 === 1)
    assert(db.query("t", Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-01-01 11:00:00")).count() === 200)
    db.close()
  }
}
