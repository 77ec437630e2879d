package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.{QueryDef, Tables}

/** Window functions — absent from the reference (SURVEY.md §2b);
  * SURVEY.md §2c Q23–Q25.
  *
  * Scale notes: each window spec is one shuffle on its partition keys and
  * a within-partition sort. Per-user / per-customer partitions are small
  * and uniform in this schema; windows with skewed keys would get a
  * two-level (salted prefix + merge) treatment instead.
  *
  * Determinism: frame sums over doubles go through DECIMAL(25,10) —
  * DuckDB evaluates moving frames with a segment tree whose FP
  * association differs from Spark's running accumulation, so exact
  * decimal arithmetic is the only bit-stable formulation.
  */
object WindowQueries {
  import Tables.t

  /** Q23: ranking functions. rank/dense_rank ordered by a tie-having key
    * (well-defined under ties); row selection via a fully tie-broken
    * row_number so output rows are deterministic. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val byQty = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc)
    val total = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    t(spark, dir, "lineitem")
      // rank-prefilter FIRST: each rank/row_number filter sits directly
      // above its window, so Spark plans a partial WindowGroupLimit
      // before the shuffle — candidates are pruned per input partition,
      // not after a full-table exchange. Ordering the FIRST window by
      // (qty desc) alone matters: partitionBy(l_returnflag) has ~3
      // distinct values, so sort prefixes never discriminate and every
      // comparison falls through to the row comparator — a 4-column
      // tie-broken comparator makes the big per-partition sort ~2×
      // slower than the 2-column one. rank()≤10 keeps a tie-inclusive
      // superset (every row that could be in any top-10 answer), and the
      // fully tie-broken row_number then runs over survivors only.
      // Trade-off vs row_number-first: that form shuffles a hard-capped
      // 10 rows/group/partition but pays the expensive comparator on
      // 100% of rows; rank-first pays the cheap sort always and shuffles
      // a data-dependent tie superset (= rows at the boundary value) —
      // the right default when the order key is selective, and AQE
      // absorbs the variance when it is not.
      .withColumn("rnk", rank().over(byQty))
      .filter(col("rnk") <= 10)
      .withColumn("rn", row_number().over(total))
      .filter(col("rn") <= 10)
      .withColumn("drnk", dense_rank().over(byQty))
      .select(col("l_returnflag"), col("rn"), col("rnk"), col("drnk"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_returnflag"), col("rn"))
  }

  /** Q23b: distribution ranking functions — ntile / percent_rank /
    * cume_dist. Cross-engine exact: both are single IEEE divisions of
    * exact integers ((rank-1)/(n-1), peers/n), so no Det framing needed;
    * the order-by includes the unique o_orderkey so peer groups are
    * singletons and ranks are well-defined. */
  def windowDistFns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .filter(col("o_custkey") < 20)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("nt4", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q24: analytic functions — lag/lead/first/last with explicit frames. */
  def windowAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("first_date", first(col("o_orderdate")).over(full))
      .withColumn("last_date", last(col("o_orderdate")).over(full))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Q25: frame specs — running sum and a 4-row moving average. */
  def windowFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dec = col("value").cast(DecimalType(25, 10))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("running_sum",
        graft.core.Det.dec2dbl(
          sum(dec).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("moving_avg",
        (graft.core.Det.dec2dbl(sum(dec).over(w.rowsBetween(-3, Window.currentRow))) /
          count(lit(1)).over(w.rowsBetween(-3, Window.currentRow)).cast("double")))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Q25b: EWMA over a bounded frame — exponential smoothing expressed
    * as collect_list over a ROWS frame + an explicit left fold
    * (y ← 0.75·y + 0.25·x, zero-initialized, oldest→newest). Windows
    * cannot weight by in-frame offset, but the fold can — and because
    * both engines fold the identically-ordered list with the identical
    * double operations (0.25/0.75 are exact binary fractions), the
    * result is bit-identical cross-engine with no Det framing. */
  def windowEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-7, Window.currentRow)
    t(spark, dir, "events")
      .filter(col("user_id") < 200)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("ewma",
        aggregate(collect_list(col("value")).over(w), lit(0.0),
          (acc, x) => acc * lit(0.75) + x * lit(0.25)))
      .drop("value")
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Q25 (time-range frame): trailing 1-hour per-user aggregates at
    * every event — the VALUE-range frame the ROWS specs can't express
    * (a frame of "the last hour", not "the last k rows"). Spark's
    * rangeBetween takes numeric offsets, so the ordering is
    * unix_micros(ts) with a ±µs window; frame membership depends only
    * on timestamp VALUES, so equal-ts rows see identical frames on any
    * engine (no tie-order sensitivity). */
  def windowTimeRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    val dec = col("value").cast(DecimalType(25, 10))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        graft.core.Det.dec2dbl(sum(dec).over(w)).as("sum_1h"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q29c_window_time_range", windowTimeRange, Some(
      """SELECT user_id, event_id, ts,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) OVER w AS VARCHAR)
        |       AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin)),
    QueryDef("q29b_window_ewma", windowEwma, Some(
      """SELECT user_id, event_id, ts,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
        |              (acc, x) -> acc * 0.75 + x * 0.25) AS ewma
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vals
        |  FROM events WHERE user_id < 200)
        |ORDER BY user_id, ts, event_id""".stripMargin)),
    QueryDef("q27_window_rank", windowRank, Some(
      """SELECT l_returnflag, CAST(rn AS INTEGER) AS rn, CAST(rnk AS INTEGER) AS rnk,
        |       CAST(drnk AS INTEGER) AS drnk, l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS drnk,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 10 ORDER BY l_returnflag, rn""".stripMargin),
      headline = true),
    QueryDef("q27b_window_dist_fns", windowDistFns, Some(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(ntile(4) OVER w AS INTEGER) AS nt4,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders WHERE o_custkey < 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
    QueryDef("q28_window_analytic", windowAnalytic, Some(
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  lag(o_totalprice, 1)  OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_date,
        |  last_value(o_orderdate)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_date
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),
    QueryDef("q29_window_frames", windowFrames, Some(
      """SELECT user_id, event_id, ts, value,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_sum,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(25,10))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
        |  / CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin))
  )
}
