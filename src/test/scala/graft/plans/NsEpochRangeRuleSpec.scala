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

  test("rule preserves results on pre-epoch (negative) raw-ns values") {
    import spark.implicits._
    // DIV truncates toward zero: -500 DIV 1000 = 0, so µs-bucket 0
    // contains ns ∈ [-999, 999] — the derived bounds must not drop the
    // negative half.
    val ns = Seq(-2500L, -1500L, -1000L, -999L, -500L, -1L, 0L, 1L,
      999L, 1000L, 1500L, 2500L)
    val dir = java.nio.file.Files.createTempDirectory("nsrule").toString
    ns.toDF("ts").write.mode("overwrite").parquet(dir)

    val preds = Seq(
      "timestamp_micros(ts div 1000) >= timestamp_micros(0)",
      "timestamp_micros(ts div 1000) <= timestamp_micros(0)",
      "timestamp_micros(ts div 1000) =  timestamp_micros(0)",
      "timestamp_micros(ts div 1000) <  timestamp_micros(1)",
      "timestamp_micros(ts div 1000) >  timestamp_micros(0)")

    for (p <- preds) {
      val without = spark.read.parquet(dir).where(p)
        .as[Long].collect().sorted.toSeq
      spark.sessionState.experimentalMethods.extraOptimizations =
        Seq(NsEpochRangeRule)
      try {
        val withRule = spark.read.parquet(dir).where(p)
          .as[Long].collect().sorted.toSeq
        assert(withRule === without, s"rule changed results for: $p")
      } finally {
        spark.sessionState.experimentalMethods.extraOptimizations = Nil
      }
    }
    // sanity: the u=0 >= case really does include negative-ns rows
    assert(spark.read.parquet(dir).where(preds.head).count() === 9)
  }

  test("without the rule, nothing beyond IsNotNull is pushed") {
    val naive = Tables.t(spark, sf(), "events")
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp"))
    val pf = pushedFilters(naive)
    assert(!pf.contains("GreaterThanOrEqual(ts,"), s"unexpected pushdown: $pf")
  }
}
