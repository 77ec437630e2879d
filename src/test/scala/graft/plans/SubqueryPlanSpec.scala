package graft.plans

import graft.SparkSuite
import graft.core.Tables
import graft.queries.SubqueryQueries

/** Proof for SURVEY.md §4's subquery rows: Catalyst rewrites every
  * declared subquery form into a join-shaped plan — nothing executes a
  * per-row subplan, so q41–q43 scale exactly like the q10–q18 joins —
  * and a subquery referenced twice is executed once (ReuseSubquery).
  */
class SubqueryPlanSpec extends SparkSuite {

  test("IN subquery is rewritten to a left-semi join") {
    val plan = SubqueryQueries.inSubquery(spark, sf())
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected LeftSemi in:\n$plan")
    assert(!plan.contains("InSubquery"), s"unrewritten IN subquery in:\n$plan")
  }

  test("correlated scalar subquery is decorrelated to aggregate + join") {
    val qe = SubqueryQueries.correlatedSubquery(spark, sf()).queryExecution
    val plan = qe.optimizedPlan.toString
    assert(plan.contains("Join"), s"expected a join in:\n$plan")
    assert(!plan.contains("scalar-subquery"),
      s"correlated scalar subquery survived decorrelation:\n$plan")
  }

  test("LATERAL + LIMIT decorrelates to WindowGroupLimit, not a per-row subplan") {
    val plan = SubqueryQueries.lateralTopK(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected decorrelated WindowGroupLimit top-k in:\n$plan")
  }

  test("a scalar subquery referenced twice executes once (ReusedSubquery)") {
    Tables.t(spark, sf(), "orders").createOrReplaceTempView("sq_orders")
    val df = spark.sql(
      """SELECT o_orderkey FROM sq_orders
        |WHERE o_totalprice >= (SELECT max(o_totalprice) FROM sq_orders) * 0.9
        |  AND o_totalprice <= (SELECT max(o_totalprice) FROM sq_orders)
        |""".stripMargin)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedSubquery"),
      s"expected ReusedSubquery in executed plan:\n$executed")
  }
}
