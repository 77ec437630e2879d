package graft.plans

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

class NsEpochRangeRuleSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force final plan
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s.metadata.getOrElse("PushedFilters", "[]")
    }.mkString(";")
  }

  test("naive ts filter gains pushable raw-ns range predicates") {
    spark.sessionState.experimentalMethods.extraOptimizations =
      Seq(NsEpochRangeRule)
    try {
      val naive = Tables.t(spark, sf(), "events")
        .filter(col("ts").between(
          lit("2024-01-05 00:00:00").cast("timestamp"),
          lit("2024-01-15 00:00:00").cast("timestamp")))

      val pf = pushedFilters(naive)
      assert(pf.contains("GreaterThanOrEqual(ts,"), s"no lower bound pushed: $pf")
      assert(pf.contains("LessThanOrEqual(ts,"), s"no upper bound pushed: $pf")

      // result parity with the hand-rewritten scan
      val expected = Tables.eventsRange(spark, sf(),
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      assert(naive.count() === expected.count())
      assert(naive.count() > 0)
    } finally {
      spark.sessionState.experimentalMethods.extraOptimizations = Nil
    }
  }

  test("without the rule, nothing beyond IsNotNull is pushed") {
    val naive = Tables.t(spark, sf(), "events")
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp"))
    val pf = pushedFilters(naive)
    assert(!pf.contains("GreaterThanOrEqual(ts,"), s"unexpected pushdown: $pf")
  }
}
