package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resample: bucket by a calendar unit, aggregate, and
  * gap-fill empty buckets (SURVEY.md §2c Q26). The reference stores
  * time-bucketed tablets but has no downsampling; this is the analytic
  * form of its layout.
  *
  * Scale notes: the aggregate is a plain hash agg on the bucket; the
  * gap grid is generated from the global [min,max] bucket with
  * `sequence` (one row → explode), so grid size is bounded by the time
  * span / unit, independent of input row count. The grid side of the
  * join is tiny → broadcast.
  */
object Resample {

  /** @param unit date_trunc unit, e.g. "hour", "day"
    * @param step matching interval expression, e.g. "INTERVAL 1 HOUR"
    * @param aggs aggregates over each bucket (must tolerate absent rows
    *   via the fill values)
    * @param fills per-output-column fill value for empty buckets
    */
  def resample(
      df: DataFrame,
      timeCol: String,
      unit: String,
      step: String,
      aggs: Seq[(Column, String)],
      fills: Map[String, Column]): DataFrame = {

    val agg = df
      .groupBy(date_trunc(unit, col(timeCol)).as("bucket"))
      .agg(aggs.head._1.as(aggs.head._2),
        aggs.tail.map { case (c, n) => c.as(n) }: _*)

    val grid = agg
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr(step))).as("bucket"))

    grid.join(agg, Seq("bucket"), "left_outer")
      .select(col("bucket") +: aggs.map { case (_, n) =>
        fills.get(n).map(f => coalesce(col(n), f).as(n)).getOrElse(col(n))
      }: _*)
      .orderBy(col("bucket"))
  }

  /** Resample with linear-interpolation gap fill: an empty bucket gets
    * the value interpolated between the nearest observed buckets on
    * either side; a missing side falls back to the other (edge LOCF).
    * Two window passes over the GRID (not the data), so like
    * [[resampleLocf]] the window size is bounded by time span / step
    * regardless of input row count. Cross-engine exact: the fraction is
    * one IEEE division of exact µs integers and the blend keeps a fixed
    * operation order.
    *
    * SINGLE-SERIES utility (unpartitioned windows = one task); the
    * canonical per-key form is [[resampleInterpolateByKey]]. */
  def resampleInterpolate(
      df: DataFrame,
      timeCol: String,
      unit: String,
      step: String,
      valueAgg: Column,
      valueName: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val filled = resample(df, timeCol, unit, step,
      aggs = Seq((count(lit(1)), "__n"), (valueAgg, valueName)),
      fills = Map("__n" -> lit(0L)))
    val wPrev = W.orderBy(col("bucket")).rowsBetween(W.unboundedPreceding, 0)
    val wNext = W.orderBy(col("bucket")).rowsBetween(0, W.unboundedFollowing)
    val obs = when(col("__n") > 0, col(valueName))
    val obsTs = when(col("__n") > 0, col("bucket"))
    val frac =
      (unix_micros(col("bucket")) - unix_micros(col("__pt"))).cast("double") /
        (unix_micros(col("__nt")) - unix_micros(col("__pt"))).cast("double")
    filled
      .withColumn("__pv", last(obs, ignoreNulls = true).over(wPrev))
      .withColumn("__pt", last(obsTs, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(obs, ignoreNulls = true).over(wNext))
      .withColumn("__nt", first(obsTs, ignoreNulls = true).over(wNext))
      .withColumn(valueName,
        when(col("__n") > 0, col(valueName))
          .when(col("__pt").isNull, col("__nv"))
          .when(col("__nt").isNull, col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) * frac))
      .withColumn("was_gap", col("__n") === 0)
      .select(col("bucket"), col(valueName), col("was_gap"))
      .orderBy(col("bucket"))
  }

  /** Per-key LOCF resample: each key gets its own gap grid spanning its
    * own [min, max] bucket, and the carry-forward window is PARTITIONED
    * by the key — the per-series form that parallelizes over keys at
    * scale (the unkeyed [[resampleLocf]] runs its bounded grid through
    * one task, fine for a single global series only). Grid size is
    * Σ per-key span/step; the grid join broadcasts nothing — it is
    * generated from the aggregate itself. */
  def resampleLocfByKey(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      unit: String,
      step: String,
      valueAgg: Column,
      valueName: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val agg = df
      .groupBy(col(keyCol), date_trunc(unit, col(timeCol)).as("bucket"))
      .agg(count(lit(1)).as("__n"), valueAgg.as(valueName))
    val grid = agg
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), expr(step))).as("bucket"))
    val w = W.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, 0)
    grid.join(agg, Seq(keyCol, "bucket"), "left_outer")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumn(valueName,
        last(when(col("__n") > 0, col(valueName)), ignoreNulls = true).over(w))
      .withColumn("was_gap", col("__n") === 0)
      .select(col(keyCol), col("bucket"), col(valueName), col("was_gap"))
      .orderBy(col(keyCol), col("bucket"))
  }

  /** Per-key linear-interpolation resample — the keyed sibling of
    * [[resampleInterpolate]] and the CANONICAL interpolation form: each
    * key gets its own gap grid over its own [min, max] bucket and both
    * neighbour-scan windows are PARTITIONED by the key, so the work
    * parallelizes over series instead of funnelling the whole grid
    * through one task. Same exact-fraction semantics as the global form
    * (one IEEE division of exact µs integers, fixed blend order). */
  def resampleInterpolateByKey(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      unit: String,
      step: String,
      valueAgg: Column,
      valueName: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val agg = df
      .groupBy(col(keyCol), date_trunc(unit, col(timeCol)).as("bucket"))
      .agg(count(lit(1)).as("__n"), valueAgg.as(valueName))
    val grid = agg
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"), expr(step))).as("bucket"))
    val wPrev = W.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, 0)
    val wNext = W.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(0, W.unboundedFollowing)
    val filled = grid.join(agg, Seq(keyCol, "bucket"), "left_outer")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
    val obs = when(col("__n") > 0, col(valueName))
    val obsTs = when(col("__n") > 0, col("bucket"))
    val frac =
      (unix_micros(col("bucket")) - unix_micros(col("__pt"))).cast("double") /
        (unix_micros(col("__nt")) - unix_micros(col("__pt"))).cast("double")
    filled
      .withColumn("__pv", last(obs, ignoreNulls = true).over(wPrev))
      .withColumn("__pt", last(obsTs, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(obs, ignoreNulls = true).over(wNext))
      .withColumn("__nt", first(obsTs, ignoreNulls = true).over(wNext))
      .withColumn(valueName,
        when(col("__n") > 0, col(valueName))
          .when(col("__pt").isNull, col("__nv"))
          .when(col("__nt").isNull, col("__pv"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) * frac))
      .withColumn("was_gap", col("__n") === 0)
      .select(col(keyCol), col("bucket"), col(valueName), col("was_gap"))
      .orderBy(col(keyCol), col("bucket"))
  }

  /** Resample with last-observation-carried-forward gap fill: empty
    * buckets inherit the most recent non-empty bucket's value (per
    * optional partition key) — the standard time-series fill for
    * sampled metrics. One window pass over the gap grid.
    *
    * SINGLE-SERIES utility: the unpartitioned window runs the whole
    * grid through one task — fine for one global series (grid size is
    * bounded by time span / step, not row count), wrong for per-key
    * fills. The canonical per-key form is [[resampleLocfByKey]]. */
  def resampleLocf(
      df: DataFrame,
      timeCol: String,
      unit: String,
      step: String,
      valueAgg: Column,
      valueName: String): DataFrame = {
    val filled = resample(df, timeCol, unit, step,
      aggs = Seq((count(lit(1)), "__n"), (valueAgg, valueName)),
      fills = Map("__n" -> lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    filled
      .withColumn(valueName,
        last(when(col("__n") > 0, col(valueName)), ignoreNulls = true).over(w))
      .withColumn("was_gap", (col("__n") === 0).as("was_gap"))
      .drop("__n")
      .orderBy(col("bucket"))
  }

  /** OHLC downsampling bars — the financial-style per-bucket summary
    * (open/high/low/close + count) every time-series store grows: one
    * hash aggregate on (key, bucket), no window, no sort. Open/close
    * are `min_by`/`max_by` with a (ts, value) struct ordering, so rows
    * sharing the bucket's first/last timestamp resolve deterministically
    * (smallest/largest value wins) — the property the cross-engine
    * oracle needs and real replays want. */
  def ohlc(
      df: DataFrame,
      keyCol: String, timeCol: String, valueCol: String,
      unit: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc(unit, col(timeCol)).as("bucket_start"))
      .agg(
        min_by(col(valueCol), struct(col(timeCol), col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), struct(col(timeCol), col(valueCol))).as("close"),
        count(lit(1)).as("n"))

  /** Time-weighted average per (key, bucket) — the irregular-sampling
    * aggregate a plain AVG gets wrong: each observation holds its value
    * until the next one arrives (LOCF weighting), the last one until
    * the bucket ends, so a sensor that reports 100 for 59 minutes and 0
    * for 1 minute averages ~98, not 50. Weights are exact integer µs
    * (ties on ts collapse to weight 0 for all but the tie's last row —
    * any order of full duplicates yields the same sums). The numerator
    * Σ value·weight is EXACT decimal arithmetic: value casts to
    * DECIMAL(15,10) (the [[graft.core.Det]] conversion, |v| < 1e5),
    * the µs weight to DECIMAL(19,0) — wide enough that DuckDB computes
    * in int128 instead of overflowing int64 — and their product (35
    * digits,
    * inside every engine's 38-digit width) multiplies and sums with
    * zero rounding. Two double formulations were measured DIVERGENT
    * first: value×(µs as double) overflows the decimal cast's 17
    * significant digits at 1e12 magnitude, and (µs/width)×value lands
    * products of low-precision values exactly on the 10th-decimal
    * rounding boundary, where Spark (HALF_UP on the shortest repr) and
    * DuckDB (true-value rounding) disagree. Exact integers sidestep
    * both. The final ratio is ONE IEEE division of two exactly-known
    * operands — hash-portable like the q29 frame sums.
    *
    * Scale shape: one shuffle on (key, bucket) feeding a lead() window
    * and a partial-aggregated group-by — the q30g gap-report plan plus
    * a map-side combine. */
  def twa(
      df: DataFrame,
      keyCol: String, timeCol: String, valueCol: String,
      unit: String): DataFrame = {
    val bucketed = df
      .select(col(keyCol), col(timeCol), col(valueCol))
      .withColumn("bucket_start", date_trunc(unit, col(timeCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("bucket_start"))
      .orderBy(col(timeCol), col(valueCol))
    bucketed
      .withColumn("next_ts", lead(col(timeCol), 1).over(w))
      .withColumn("w_us",
        coalesce(unix_micros(col("next_ts")),
          unix_micros(col("bucket_start") + expr(s"INTERVAL 1 $unit")))
          - unix_micros(col(timeCol)))
      .groupBy(col(keyCol), col("bucket_start"))
      .agg(
        graft.core.Det.dec2dbl(
          sum(col(valueCol).cast("decimal(15,10)") *
            col("w_us").cast("decimal(19,0)"))).as("num"),
        sum(col("w_us")).as("den_us"),
        count(lit(1)).as("n"))
      .select(col(keyCol), col("bucket_start"),
        (col("num") / col("den_us").cast("double")).as("twa"),
        col("n"))
  }

  /** Gap detection — per-series intervals with no observations for
    * STRICTLY longer than `minGap` (a spacing of exactly minGap is not
    * a gap): (key, gap_start, gap_end, gap_us) for each pair of
    * CONSECUTIVE rows further apart than the threshold. One key-
    * partitioned window (a single shuffle + per-key sort); output rows
    * reference only the two timestamps, so equal-ts duplicates pair
    * identically on any engine and the result is order-independent.
    * The monitoring complement of the resample family: resample FILLS
    * gaps, this one REPORTS them. */
  def gaps(
      df: DataFrame,
      keyCol: String, timeCol: String,
      minGap: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(timeCol))
    df.select(col(keyCol), col(timeCol).as("gap_start"),
        lead(col(timeCol), 1).over(w).as("gap_end"))
      .filter(col("gap_end").isNotNull &&
        col("gap_end") > col("gap_start") + expr(s"INTERVAL $minGap"))
      .withColumn("gap_us",
        unix_micros(col("gap_end")) - unix_micros(col("gap_start")))
  }
}
