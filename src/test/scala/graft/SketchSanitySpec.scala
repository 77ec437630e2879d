package graft

import graft.queries.AggQueries
import org.apache.spark.sql.functions._

/** The two sketch queries (HLL++ approx-distinct, approx-percentile)
  * cannot expose raw estimates to a cross-engine hash (estimates are
  * engine-specific), so they are declared SELF-VALIDATING: the output
  * carries exact anchors plus in-query tolerance verdicts that the
  * DuckDB oracle asserts. This spec checks the same contract locally —
  * the verdict columns must be true, and the exact anchors must agree
  * with independently computed exact aggregates.
  */
class SketchSanitySpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct verdict true; exact anchor matches") {
    val out = AggQueries.approxDistinct(spark, sf("sf0.01"))
      .as[(String, Long, Boolean)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._3), s"sketch outside 5% tolerance: ${out.mkString(",")}")
    val exact = graft.core.Tables.t(spark, sf("sf0.01"), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .as[(String, Long)].collect().toMap
    assert(out.map(r => r._1 -> r._2).toMap === exact)
  }

  test("approx_percentile verdicts true; exact rank bounds ordered") {
    val out = AggQueries.approxPercentile(spark, sf("sf0.01"))
      .as[(String, Double, Double, Double, Double, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (flag, p50lo, p50hi, p95lo, p95hi, ok50, ok95) =>
      assert(ok50, s"$flag: approx p50 outside exact [$p50lo, $p50hi]")
      assert(ok95, s"$flag: approx p95 outside exact [$p95lo, $p95hi]")
      assert(p50lo <= p50hi && p95lo <= p95hi && p50hi <= p95lo)
    }
  }
}
