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

  /** A raw int64-ns event-time fixture — the representation the rule
    * exists for (TIMESTAMP(NANOS) files read under nanosAsLong; the
    * driver testdata has carried both this and TIMESTAMP_NTZ µs across
    * generations, so the spec pins its own file rather than assuming
    * either). 2024-01-01..2024-02-04, one row per 10 minutes. */
  private def nsFixture(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nsrule_ev").toString
    val base = 1704067200000000000L // 2024-01-01 00:00:00 UTC in ns
    (0 until 4900).map(i => base + i.toLong * 600L * 1000000000L)
      .toDF("ts").write.mode("overwrite").parquet(dir)
    dir
  }

  test("naive ts filter gains pushable raw-ns range predicates") {
    val dir = nsFixture()
    spark.sessionState.experimentalMethods.extraOptimizations =
      Seq(NsEpochRangeRule)
    try {
      // the same µs-conversion Tables.normTs applies to a long column
      val naive = Tables.normTs(spark.read.parquet(dir))
        .filter(col("ts").between(
          lit("2024-01-05 00:00:00").cast("timestamp"),
          lit("2024-01-15 00:00:00").cast("timestamp")))

      val pf = pushedFilters(naive)
      assert(pf.contains("GreaterThanOrEqual(ts,"), s"no lower bound pushed: $pf")
      assert(pf.contains("LessThanOrEqual(ts,"), s"no upper bound pushed: $pf")

      // result parity with the hand-rewritten raw-domain scan
      // (inclusive range, ns ∈ [lo_us*1000, hi_us*1000 + 999])
      val expected = spark.read.parquet(dir)
        .filter(col("ts") >= 1704412800000000L * 1000L &&
          col("ts") <= 1705276800000000L * 1000L + 999L)
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

  test("without the rule, nothing beyond IsNotNull is pushed on ns files") {
    val naive = Tables.normTs(spark.read.parquet(nsFixture()))
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp"))
    val pf = pushedFilters(naive)
    assert(!pf.contains("GreaterThanOrEqual(ts,"), s"unexpected pushdown: $pf")
  }

  test("TIMESTAMP_NTZ files push the range natively through normTs") {
    import spark.implicits._
    // the other representation the driver testdata ships: naive µs
    // (isAdjustedToUTC=false). The LTZ cast normTs adds sits ABOVE the
    // filter after optimization (unwrap-cast), so the range reaches the
    // scan with no custom rule involved.
    val dir = java.nio.file.Files.createTempDirectory("ntz_ev").toString
    (0 until 490).map(i => 1704067200000000L + i.toLong * 6000L * 1000000L)
      .toDF("us").select(timestamp_micros(col("us"))
        .cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(dir)
    val df = Tables.normTs(spark.read.parquet(dir))
      .filter(col("ts").between(
        lit("2024-01-05 00:00:00").cast("timestamp"),
        lit("2024-01-15 00:00:00").cast("timestamp")))
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val pf = pushedFilters(df)
    assert(pf.contains("GreaterThanOrEqual(ts,"), s"no lower bound pushed: $pf")
    assert(pf.contains("LessThanOrEqual(ts,"), s"no upper bound pushed: $pf")
    assert(df.count() > 0)
  }
}
