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
    // parquet reader rejects. Read nanos as long and truncate to
    // microseconds — the same truncation DuckDB applies on read, so the
    // two engines see identical timestamps.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // integer DIV, not fp division — ns values exceed double's 2^53
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }
}
