package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's event stream into sessions at
  * inactivity gaps — the batch twin of the streaming session windows
  * (StreamingQueries s3 / Spark session_window). The reference has no
  * session concept (SURVEY.md §2b); this is the standard
  * clickstream/training-log primitive: a session is a maximal run of
  * events where consecutive gaps are <= `gapUs`.
  *
  * Formulation is the distributed one: flag session STARTS with a lag()
  * comparison, number sessions with a running sum of the flags — two
  * window expressions over the SAME (partition, order) spec, so
  * Catalyst plans ONE exchange on the key and one sort; no
  * self-join, no driver-side scan. At 100 TB the cost is exactly one
  * shuffle of (key, ts, carried columns) — the minimum for any
  * per-key ordered computation — and per-key state is a single lag
  * value, so skewed keys stream through the window operator without
  * memory growth (Spark's WindowExec buffers only frames that need it;
  * lag/running-sum are O(1) incremental).
  *
  * Gap arithmetic is in integral MICROSECONDS (unix_micros), never fp —
  * exact and oracle-portable (DuckDB epoch_ns // 1000).
  */
object Sessionize {

  /** Adds `session_no` (1-based per key, in time order) to `df`.
    * `tieBreak` columns disambiguate equal timestamps deterministically
    * — required for a stable oracle when (key, time) is not unique. */
  def assignSessions(
      df: DataFrame, keyCol: String, timeCol: String, gapUs: Long,
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(gapUs > 0, s"session gap must be positive, got $gapUs")
    val order: Seq[Column] = col(timeCol) +: tieBreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val us = unix_micros(col(timeCol))
    val prev = lag(us, 1).over(w)
    val newSess = when(prev.isNull || us - prev > gapUs, 1).otherwise(0)
    df.withColumn("session_no",
      sum(newSess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: start/end timestamps and event count. */
  def sessionize(
      df: DataFrame, keyCol: String, timeCol: String, gapUs: Long,
      tieBreak: Seq[String] = Seq.empty): DataFrame =
    assignSessions(df, keyCol, timeCol, gapUs, tieBreak)
      .groupBy(col(keyCol), col("session_no"))
      .agg(
        min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
