package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Fixture-table access. One parquet file per table under an sf dir
  * (TESTDATA.md). All queries read through here so a future move to a
  * partitioned/bucketed layout is a one-line change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize a file-borne event-time column to session-zoned
    * TimestampType whatever representation the writer chose — the three
    * that occur in the wild (and across driver testdata generations):
    *  - int64 nanos (TIMESTAMP(NANOS) read under
    *    spark.sql.legacy.parquet.nanosAsLong=true): integer-DIV to µs —
    *    the truncation DuckDB applies on read, and integer DIV, not fp
    *    division, because ns magnitudes exceed double's 2^53;
    *  - TIMESTAMP_NTZ (naive µs, isAdjustedToUTC=false): cast to LTZ.
    *    Sessions pin spark.sql.session.timeZone=UTC, so the cast
    *    relabels the same instant — bit-identical µs to what DuckDB
    *    sees — and downstream µs arithmetic (unix_micros) type-checks;
    *  - already TimestampType: no-op.
    * Every operator downstream of the read boundary can then assume
    * TimestampType unconditionally. */
  def normTs(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"`$c` DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(c, col(c).cast(TimestampType))
      case _ => df
    }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normTs(df) else df
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
    df.schema("ts").dataType match {
      case LongType =>
        df.filter(col("ts") >= us(lo) * 1000L && col("ts") <= us(hi) * 1000L + 999L)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // filter in the NTZ domain with NTZ literals (LocalDateTime), so
        // the range predicate pushes to the parquet scan WITHOUT a cast
        // wrapping the column (a cast on the column side would defeat
        // row-group skipping — fatal at 100 TB); normalize to LTZ after
        df.filter(col("ts").between(
            lit(lo.toLocalDateTime), lit(hi.toLocalDateTime)))
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        df.filter(col("ts").between(lit(lo), lit(hi)))
    }
  }
}
