package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table access. One parquet file per table under an sf dir
  * (TESTDATA.md). All queries read through here so a future move to a
  * partitioned/bucketed layout is a one-line change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) in-file, which Spark's vectorized
    // parquet reader rejects. Sessions set
    // spark.sql.legacy.parquet.nanosAsLong=true at BUILD time (Bench/
    // Verify/Engine.session/SparkSuite) so the nanos arrive as longs,
    // truncated here to microseconds — the same truncation DuckDB
    // applies on read, so the two engines see identical timestamps.
    // (Reading through a session without the flag still works wherever
    // the file's ts is already a timestamp type — the LongType branch
    // below is a no-op then.)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integer DIV, not fp division — ns values exceed double's 2^53
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** events with an inclusive [lo, hi] time-range predicate applied on
    * the RAW ns long BEFORE the µs conversion. A predicate on
    * `timestamp_micros(ts DIV 1000)` cannot be pushed to parquet (no
    * row-group skipping — fatal at 100 TB); the equivalent raw-domain
    * range `ns ∈ [lo_us*1000, hi_us*1000 + 999]` pushes down and is
    * exact under the µs-truncation semantics. */
  def eventsRange(spark: SparkSession, dir: String,
      lo: java.sql.Timestamp, hi: java.sql.Timestamp): DataFrame = {
    val df = spark.read.parquet(s"$dir/events.parquet")
    // interpret the naive timestamp as UTC regardless of JVM default TZ
    // (file ns values are naive; session TZ is pinned UTC)
    def us(t: java.sql.Timestamp): Long =
      t.toLocalDateTime.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        t.getNanos / 1000L
    if (df.schema("ts").dataType == LongType)
      df.filter(col("ts") >= us(lo) * 1000L && col("ts") <= us(hi) * 1000L + 999L)
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else
      df.filter(col("ts").between(lit(lo), lit(hi)))
  }
}
