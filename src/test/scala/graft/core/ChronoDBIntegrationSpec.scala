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

  test("lifecycle: insert → lookup → delete → compact → analyze → restore, verbs composing") {
    // the round-8 surface exercised TOGETHER — per-verb specs cannot
    // see cross-verb interactions (a deleteKey sidecar rewrite feeding
    // compact's fold, a backup taken mid-lifecycle restoring the key
    // index along with the data)
    val dir = Files.createTempDirectory("lifecycle").toString
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
      compactFileThreshold = 2))
    db.createTable("ev")
    val src = Tables.t(spark, sf(), "events")
    def rows(lo: Long, hi: Long) = src
      .filter(col("user_id") >= lo && col("user_id") < hi)
      .select(col("user_id").cast("string").as("key"), col("ts"),
        col("props").cast("binary").as("data")).as[ChronoRow]
    // two batches → per-bucket sidecar rows to fold, files to compact
    db.insert("ev", rows(0L, 8L))
    db.insert("ev", rows(8L, 1000000L))
    val total = src.count()
    assert(db.table("ev").count() === total)

    // bloom point lookup == direct filter, before any maintenance
    val k = src.agg(min(col("user_id"))).head().getLong(0).toString
    val kCount = src.filter(col("user_id").cast("string") === k).count()
    assert(db.queryKey("ev", k).count() === kCount)

    // snapshot BEFORE the delete; then forget the key
    val bak = Files.createTempDirectory("lifecycle_bak").toString + "/ev"
    db.backup("ev", bak)
    assert(db.deleteKey("ev", k) === kCount)
    assert(db.queryKey("ev", k).count() === 0L)
    assert(db.table("ev").count() === total - kCount)
    assert(db.sidecarsConsistent("ev"))

    // compact folds the (rewritten + original) sidecar rows; the index
    // must still answer for surviving keys afterward
    db.compact("ev")
    assert(db.sidecarsConsistent("ev"))
    val k2 = src.agg(max(col("user_id"))).head().getLong(0).toString
    assert(db.queryKey("ev", k2).count() ===
      src.filter(col("user_id").cast("string") === k2).count())

    // stats loop: analyze, then the estimate answers from the sidecar
    assert(db.analyzeIfStale("ev"))
    val s = Timestamp.valueOf("2024-01-10 00:00:00")
    val e = Timestamp.valueOf("2024-01-20 00:00:00")
    assert(db.estimateRowsInRange("ev", s, e) > 0.0)

    // restore the pre-delete snapshot: the forgotten key is back, and
    // the restored sidecar serves its bloom lookup again
    db.restore("ev", bak)
    assert(db.queryKey("ev", k).count() === kCount)
    assert(db.sidecarsConsistent("ev"))
    db.close()
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
