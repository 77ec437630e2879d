package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{QueryDef, Tables}

/** Subqueries — scalar, IN, and correlated-scalar forms. The reference
  * has no subqueries (SURVEY.md §2b: its only query path is a one-table
  * range scan), but SURVEY.md §4's rewrite checklist calls out subquery
  * decorrelation as a Catalyst built-in; these queries exercise it:
  * Catalyst rewrites the IN form to a left-semi join
  * (RewritePredicateSubquery) and the correlated scalar form to an
  * aggregate + join (decorrelation), so none of them execute per-row
  * subplans — the rewritten plans scale like the q10–q18 joins.
  *
  * Determinism note: scalar thresholds are built from MIN/MAX (exact on
  * both engines), never from double SUM/AVG, so the boundary comparisons
  * are bit-identical cross-engine (see core.Det for why double sums are
  * not).
  */
object SubqueryQueries {
  import Tables.t

  /** Q-sub1: uncorrelated scalar subquery — orders within 10% of the
    * maximum total price. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("sq_orders")
    spark.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM sq_orders
        |WHERE o_totalprice >= (SELECT max(o_totalprice) FROM sq_orders) * 0.9
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Q-sub2: IN subquery — rewritten by Catalyst to a left-semi join. */
  def inSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    t(spark, dir, "orders").createOrReplaceTempView("sq_orders")
    spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n_lines
        |FROM sq_lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM sq_orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** Q-sub3: correlated scalar subquery — lines carrying their order's
    * maximum quantity; decorrelated into aggregate + join. */
  def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    spark.sql(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM sq_lineitem l
        |WHERE l_quantity = (SELECT max(l2.l_quantity) FROM sq_lineitem l2
        |                    WHERE l2.l_orderkey = l.l_orderkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
  }

  /** Q-sub4: LATERAL correlated subquery with ORDER BY + LIMIT — the
    * SQL spelling of per-group top-k. Catalyst decorrelates the limit
    * into WindowGroupLimit (verified in SubqueryPlanSpec), i.e. the
    * same physical shape as the q07 window formulation — no per-row
    * subplan, no nation-by-nation loop. */
  def lateralTopK(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "nation").createOrReplaceTempView("sq_nation")
    t(spark, dir, "customer").createOrReplaceTempView("sq_customer")
    spark.sql(
      """SELECT n_name, c.c_custkey, c.c_acctbal
        |FROM sq_nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM sq_customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q44_lateral_topk", lateralTopK, Some(
      """SELECT n_name, c.c_custkey, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)),
    QueryDef("q41_subquery_scalar", scalarSubquery, Some(
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice >= (SELECT max(o_totalprice) FROM orders) * 0.9
        |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("q42_subquery_in", inSubquery, Some(
      """SELECT l_returnflag, COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    QueryDef("q43_subquery_correlated", correlatedSubquery, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem l
        |WHERE l_quantity = (SELECT max(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_orderkey = l.l_orderkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin))
  )
}
