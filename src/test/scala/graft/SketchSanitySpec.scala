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

  test("q57 decimal-moment stats agree with Spark's native estimators") {
    // the moment formulas are exact-decimal reformulations; Spark's
    // Welford-streaming var_samp/stddev_samp/corr are float-order
    // dependent but must agree to fp tolerance on the same data
    val got = AggQueries.statsMoments(spark, sf("sf0.01"))
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val native = graft.core.Tables.t(spark, sf("sf0.01"), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("m"),
        var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_quantity")).as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    got.foreach { case (flag, n, mean, vr, sd, cr) =>
      val (nm, nv, ns, nc) = native(flag)
      assert(n > 1)
      assert(math.abs(mean - nm) <= 1e-9 * math.abs(nm), s"$flag mean")
      assert(math.abs(vr - nv) <= 1e-6 * math.abs(nv), s"$flag var")
      assert(math.abs(sd - ns) <= 1e-6 * math.abs(ns), s"$flag stddev")
      assert(math.abs(cr - nc) <= 1e-6, s"$flag corr: $cr vs $nc")
    }
  }

  test("q57b regression agrees with Spark's native regr_slope/intercept") {
    val got = AggQueries.regressionAgg(spark, sf("sf0.01"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val native = graft.core.Tables.t(spark, sf("sf0.01"), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("sl"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("ic"),
        expr("regr_r2(l_extendedprice, l_quantity)").as("r2"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    got.foreach { case (flag, _, sl, ic, r2) =>
      val (nsl, nic, nr2) = native(flag)
      assert(math.abs(sl - nsl) <= 1e-6 * math.abs(nsl), s"$flag slope")
      assert(math.abs(ic - nic) <= 1e-6 * math.abs(nic), s"$flag intercept")
      assert(math.abs(r2 - nr2) <= 1e-6, s"$flag r2: $r2 vs $nr2")
    }
  }
}
