package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, QueryDef, Tables}

/** Joins — absent from the reference (SURVEY.md §2b: the query path
  * db.go:155→table.go:122 touches one table only); SURVEY.md §2c Q10–Q16.
  *
  * Scale notes: dimension joins (nation/region/customer-sized sides)
  * broadcast explicitly; fact-fact joins shuffle on the join key and rely
  * on AQE for skew splitting. At 100 TB the lineitem/orders co-location
  * would come from bucketing both by orderkey, which removes the shuffle
  * entirely; the declared plans keep the join keys bare (no wrapping
  * expressions) so Catalyst can use storage partitioning when present.
  */
object JoinQueries {
  import Tables.t

  /** Q10: inner equi-join fact-to-fact + aggregate. */
  def joinInner(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"), "inner")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q11: explicit broadcast joins against the dimension tables. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), Det.dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Q12: left outer join (unmatched side produced by a selective
    * pre-filter on the right). */
  def joinLeft(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val big = t(spark, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_big_orders"),
        coalesce(Det.dsum(col("o_totalprice")), lit(0.0)).as("sum_big"))
      .orderBy(col("c_custkey"))
  }

  /** Q13: full outer join of two keyed aggregates. */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    val a = t(spark, dir, "orders").filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_pending"))
    val b = t(spark, dir, "customer").filter(col("c_acctbal") > 7000)
      .select(col("c_custkey").as("k"), col("c_acctbal"))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k"), col("n_pending"), col("c_acctbal"))
      .orderBy(col("k"))
  }

  /** Q14: left semi (EXISTS). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val p = t(spark, dir, "orders").filter(col("o_orderstatus") === "P")
      .select(col("o_custkey"))
    c.join(p, c("c_custkey") === p("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Q15: left anti (NOT EXISTS). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val p = t(spark, dir, "orders").filter(col("o_orderstatus") === "P")
      .select(col("o_custkey"))
    c.join(p, c("c_custkey") === p("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Q16: range/theta join — equi key plus interval band predicate
    * (ships within 30 days of order date). */
  def joinRange(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    l.join(o,
        l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_fast"), Det.dsum(col("l_quantity")).as("qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q17: cross join (small dims only — deliberately). */
  def joinCross(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation").crossJoin(t(spark, dir, "region"))
      .select(col("n_name"), col("r_name"))
      .orderBy(col("n_name"), col("r_name"))

  /** Q18: big-big sort-merge self-join (merge hint; pairs of lines within
    * one order, bounded fan-out). */
  def joinSortMerge(spark: SparkSession, dir: String): DataFrame = {
    val l1 = t(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber").as("ln1"),
      col("l_quantity").as("q1"), col("l_returnflag").as("rf"))
    val l2 = t(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber").as("ln2"),
      col("l_quantity").as("q2"))
    l1.hint("merge")
      .join(l2, Seq("l_orderkey"))
      .filter(col("ln1") < col("ln2"))
      .groupBy(col("rf"))
      .agg(count(lit(1)).as("n_pairs"), Det.dsum(col("q1") + col("q2")).as("qty2"))
      .orderBy(col("rf"))
  }

  /** Q45: the composite-optimizer flagship — TPC-H Q5's shape verbatim:
    * two fact tables shuffle-join on their keys, three dimension tables
    * broadcast, a selective region + date-window predicate prunes
    * before the rollup, Det-exact revenue. One declared query that
    * exercises join reorder, pushdown, broadcast selection, and partial
    * aggregation TOGETHER — the "would a reference user's real report
    * run" check, not just per-operator coverage. */
  def regionalRevenueQ(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name") === "ASIA" &&
        o("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        o("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .groupBy(n("n_name").as("n_name"))
      .agg(
        Det.dsum(li("l_extendedprice") * (lit(1.0) - li("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q45_regional_revenue", regionalRevenueQ, Some(
      s"""SELECT n_name,
         |  ${Det.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),
    QueryDef("q10_join_inner", joinInner, Some(
      s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
         |       ${Det.dsumSql("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      headline = true),
    QueryDef("q11_join_broadcast", joinBroadcast, Some(
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust, ${Det.dsumSql("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),
    QueryDef("q12_join_left", joinLeft, Some(
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders,
         |       COALESCE(${Det.dsumSql("o_totalprice")}, 0.0) AS sum_big
         |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
         |  ON c_custkey = o_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),
    QueryDef("q13_join_full", joinFull, Some(
      """SELECT COALESCE(a.k, b.k) AS k, a.n_pending, b.c_acctbal
        |FROM (SELECT o_custkey AS k, COUNT(*) AS n_pending FROM orders
        |      WHERE o_orderstatus = 'P' GROUP BY o_custkey) a
        |FULL JOIN (SELECT c_custkey AS k, c_acctbal FROM customer
        |           WHERE c_acctbal > 7000) b
        |  ON a.k = b.k
        |ORDER BY k""".stripMargin)),
    QueryDef("q14_join_semi", joinSemi, Some(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)),
    QueryDef("q15_join_anti", joinAnti, Some(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin)),
    QueryDef("q16_join_range", joinRange, Some(
      s"""SELECT o_orderpriority, COUNT(*) AS n_fast, ${Det.dsumSql("l_quantity")} AS qty
         |FROM lineitem JOIN orders
         |  ON l_orderkey = o_orderkey
         | AND l_shipdate >= o_orderdate
         | AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),
    QueryDef("q17_join_cross", joinCross, Some(
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin)),
    QueryDef("q18_join_sortmerge", joinSortMerge, Some(
      s"""SELECT rf, COUNT(*) AS n_pairs, ${Det.dsumSql("q1 + q2")} AS qty2
         |FROM (SELECT l1.l_returnflag AS rf, l1.l_quantity AS q1, l2.l_quantity AS q2
         |      FROM lineitem l1 JOIN lineitem l2
         |        ON l1.l_orderkey = l2.l_orderkey
         |       AND l1.l_linenumber < l2.l_linenumber)
         |GROUP BY rf ORDER BY rf""".stripMargin),
      headline = true)
  )
}
