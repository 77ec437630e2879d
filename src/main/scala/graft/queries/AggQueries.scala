package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, QueryDef, Tables}

/** Aggregation — absent from the reference beyond GetStats counts
  * (table.go:390-414); SURVEY.md §2c Q17–Q22.
  *
  * Scale notes: all groupBys are hash aggregates with map-side partial
  * aggregation (Catalyst inserts partial/final automatically), so the
  * shuffle carries one row per (partition, group), not per input row.
  * Group-by cardinalities here are low; for high-cardinality keys AQE
  * coalesces/splits post-shuffle partitions.
  */
object AggQueries {
  import Tables.t

  /** Q17/Q1-TPC-H-style: multi-measure group-by aggregate. */
  def groupByAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q57: statistical moment aggregates — var_samp / stddev_samp /
    * Pearson corr, built CROSS-ENGINE-EXACT from decimal power sums.
    * Spark's native stddev/corr stream Welford-style partial states
    * whose float order differs per partitioning, so they can never
    * hash-match a sequential engine; instead Σx, Σx², Σy, Σy², Σxy
    * accumulate EXACTLY in decimal (order-independent — the Det
    * pattern extended to second moments; scale 6 so the square (37,12)
    * stays inside decimal-38), convert once via decimal→string→double,
    * and the textbook formulas then run as single correctly-rounded
    * IEEE ops on bit-identical operands in both engines. Fixture
    * domains make the scale-6 casts lossless (quantities integral,
    * prices 2-decimal). At 100 TB this is also the FASTER plan: exact
    * decimal sums partial-aggregate map-side like any sum, and the
    * moment row per group is mergeable state (the same five sums
    * underlie incremental/rollup variance). */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val d18 = org.apache.spark.sql.types.DecimalType(18, 6)
    val xd = col("l_quantity").cast(d18)
    val yd = col("l_extendedprice").cast(d18)
    val nd = col("n").cast("double")
    val vxNum = nd * col("sxx") - col("sx") * col("sx")
    val vyNum = nd * col("syy") - col("sy") * col("sy")
    // n·(n−1) in DOUBLE, not long: a group past ~3·10⁹ rows would wrap
    // long arithmetic silently while the oracle errors — double is exact
    // up to 2⁵³ and both engines round the product identically
    val denom = nd * (nd - lit(1.0d))
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        Det.dec2dbl(sum(xd)).as("sx"),
        Det.dec2dbl(sum(yd)).as("sy"),
        Det.dec2dbl(sum(xd * xd)).as("sxx"),
        Det.dec2dbl(sum(yd * yd)).as("syy"),
        Det.dec2dbl(sum(xd * yd)).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        (col("sx") / nd).as("mean_qty"),
        (vxNum / denom).as("var_qty"),
        sqrt(vxNum / denom).as("stddev_qty"),
        ((nd * col("sxy") - col("sx") * col("sy"))
          / (sqrt(vxNum) * sqrt(vyNum))).as("corr_qp"))
      .orderBy(col("l_returnflag"))
  }

  /** Q57b: least-squares regression aggregates (regr_slope /
    * regr_intercept / R²) — the same exact-decimal-moment machinery as
    * [[statsMoments]]: y = l_extendedprice regressed on x = l_quantity
    * per group. slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept =
    * (Σy − slope·Σx)/n, r² = corr² — every op a single
    * correctly-rounded IEEE step on bit-identical operands. */
  def regressionAgg(spark: SparkSession, dir: String): DataFrame = {
    val d18 = org.apache.spark.sql.types.DecimalType(18, 6)
    val xd = col("l_quantity").cast(d18)
    val yd = col("l_extendedprice").cast(d18)
    val nd = col("n").cast("double")
    val vxNum = nd * col("sxx") - col("sx") * col("sx")
    val vyNum = nd * col("syy") - col("sy") * col("sy")
    val cNum = nd * col("sxy") - col("sx") * col("sy")
    val slope = cNum / vxNum
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        Det.dec2dbl(sum(xd)).as("sx"),
        Det.dec2dbl(sum(yd)).as("sy"),
        Det.dec2dbl(sum(xd * xd)).as("sxx"),
        Det.dec2dbl(sum(yd * yd)).as("syy"),
        Det.dec2dbl(sum(xd * yd)).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        slope.as("slope"),
        ((col("sy") - slope * col("sx")) / nd).as("intercept"),
        ((cNum / (sqrt(vxNum) * sqrt(vyNum)))
          * (cNum / (sqrt(vxNum) * sqrt(vyNum)))).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Q18: distinct. */
  def distinctQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q18b: exact count-distinct (expands to two-phase distinct agg). */
  def countDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count_distinct(col("l_partkey")).as("nd_part"),
        count_distinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Q19: approximate distinct (HLL++), SELF-VALIDATING form: the raw
    * estimate is engine-specific (no cross-engine hash possible), so the
    * declared output carries the exact count plus an in-query relative-
    * error verdict; the oracle asserts the verdict — the row hash-matches
    * iff the sketch estimate really lands within the bound. rsd = 0.02,
    * bound = 5% (2.5 sigma; the sketch is deterministic per dataset). */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count_distinct(col("l_partkey")).as("nd_exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("apx"))
      .select(col("l_returnflag"), col("nd_exact"),
        (abs(col("apx") - col("nd_exact")).cast("double")
          <= col("nd_exact").cast("double") * 0.05).as("within_tol"))
      .orderBy(col("l_returnflag"))

  /** Q19b: approximate percentiles, SELF-VALIDATING form: accuracy 1000
    * guarantees rank error <= 0.1%, so the estimate must land between the
    * exact 49th/51st (94th/96th) percentiles; those exact bounds are part
    * of the output (hash-checked — quantile_cont is bit-identical to
    * Spark percentile, proven by q25) and the oracle asserts the
    * in-bounds verdicts. */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
          .as("apx"),
        expr("percentile(l_extendedprice, 0.49)").as("p50_lo"),
        expr("percentile(l_extendedprice, 0.51)").as("p50_hi"),
        expr("percentile(l_extendedprice, 0.94)").as("p95_lo"),
        expr("percentile(l_extendedprice, 0.96)").as("p95_hi"))
      .select(col("l_returnflag"),
        col("p50_lo"), col("p50_hi"), col("p95_lo"), col("p95_hi"),
        (element_at(col("apx"), 1) >= col("p50_lo") &&
          element_at(col("apx"), 1) <= col("p50_hi")).as("p50_in_bounds"),
        (element_at(col("apx"), 2) >= col("p95_lo") &&
          element_at(col("apx"), 2) <= col("p95_hi")).as("p95_in_bounds"))
      .orderBy(col("l_returnflag"))

  /** Q20a: rollup with grouping id. */
  def rollupQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("qty"),
        grouping_id().cast("int").as("gid"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"), col("n"), col("qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Q20b: cube. */
  def cubeQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), grouping_id().cast("int").as("gid"))
      .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"), col("n"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Q21: exact percentiles (linear interpolation at p*(n-1) — identical
    * definition in DuckDB quantile_cont). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        min(col("l_quantity")).as("qmin"),
        max(col("l_quantity")).as("qmax"))
      .orderBy(col("l_returnflag"))

  /** Q22: conditional aggregation. */
  def condAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("value") > 50, 1).otherwise(0)).as("n_high"),
        Det.dsum(when(col("user_id") % 2 === 0, col("value")).otherwise(lit(0.0))).as("even_user_value"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Q22b: pivot — one column per event_type with counts (explicit value
    * list so the schema is deterministic). */
  def pivotQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Q22c: unpivot/melt — the inverse reshape. */
  def unpivotQ(spark: SparkSession, dir: String): DataFrame =
    pivotQ(spark, dir)
      .unpivot(Array(col("user_id")),
        Array(col("click"), col("error"), col("purchase"), col("signup"), col("view")),
        "event_type", "n")
      .orderBy(col("user_id"), col("event_type"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q19_groupby_agg", groupByAgg, Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Det.dsumSql("l_quantity")} AS sum_qty,
         |  ${Det.dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${Det.dsumSql("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS sum_disc_price,
         |  ${Det.davgSql("l_quantity")} AS avg_qty,
         |  ${Det.davgSql("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),
    QueryDef("q20_distinct", distinctQ, Some(
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    QueryDef("q21_count_distinct", countDistinct, Some(
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_part,
        |       COUNT(DISTINCT l_suppkey) AS nd_supp, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    QueryDef("q22_approx_distinct", approxDistinct, Some(
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_exact,
        |       TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    QueryDef("q25b_approx_percentile", approxPercentile, Some(
      """SELECT l_returnflag,
        |       quantile_cont(l_extendedprice, 0.49) AS p50_lo,
        |       quantile_cont(l_extendedprice, 0.51) AS p50_hi,
        |       quantile_cont(l_extendedprice, 0.94) AS p95_lo,
        |       quantile_cont(l_extendedprice, 0.96) AS p95_hi,
        |       TRUE AS p50_in_bounds, TRUE AS p95_in_bounds
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    QueryDef("q22b_pivot", pivotQ, Some(
      """SELECT user_id,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS "click",
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS "error",
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS "purchase",
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS "signup",
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),
    QueryDef("q22c_unpivot", unpivotQ, Some(
      """WITH p AS (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id, event_type)
        |SELECT g.user_id, t.event_type, COALESCE(p.n, 0) AS n
        |FROM (SELECT DISTINCT user_id FROM events) g
        |CROSS JOIN (SELECT unnest(['click','error','purchase','signup','view']) AS event_type) t
        |LEFT JOIN p ON p.user_id = g.user_id AND p.event_type = t.event_type
        |ORDER BY g.user_id, t.event_type""".stripMargin)),
    QueryDef("q23_rollup", rollupQ, Some(
      s"""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
         |       l_returnflag, l_linestatus, COUNT(*) AS n, ${Det.dsumSql("l_quantity")} AS qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),
    QueryDef("q24_cube", cubeQ, Some(
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
        |       o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),
    QueryDef("q25_percentiles", percentiles, Some(
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5)  AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75,
        |       MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    QueryDef("q57_stats_moments", statsMoments, Some(
      // exact decimal power sums (order-independent), THEN the textbook
      // formulas as single IEEE ops on bit-identical operands — the op
      // tree below mirrors the Spark expressions node for node
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
        |                  * CAST(l_quantity AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
        |                  * CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
        |                  * CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  sx / CAST(n AS DOUBLE) AS mean_qty,
        |  (CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_qty,
        |  sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty,
        |  (CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
        |       * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qp
        |FROM s ORDER BY l_returnflag""".stripMargin)),
    QueryDef("q57b_regression", regressionAgg, Some(
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
        |                  * CAST(l_quantity AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
        |                  * CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
        |                  * CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
        |  (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
        |          / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
        |    / CAST(n AS DOUBLE) AS intercept,
        |  ((CAST(n AS DOUBLE) * sxy - sx * sy)
        |     / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
        |        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)))
        |  * ((CAST(n AS DOUBLE) * sxy - sx * sy)
        |     / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
        |        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))) AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin)),
    QueryDef("q26_cond_agg", condAgg, Some(
      s"""SELECT event_type,
         |  CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
         |  ${Det.dsumSql("CASE WHEN user_id % 2 = 0 THEN value ELSE CAST(0.0 AS DOUBLE) END")} AS even_user_value,
         |  COUNT(*) AS n
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
