package graft

import graft.queries.AggQueries
import org.apache.spark.sql.functions._

/** The two sketch queries (HLL++ approx-distinct, approx-percentile)
  * cannot be hash-checked cross-engine (estimates are engine-specific),
  * so this spec delivers the SURVEY §2c "sanity vs exact (tolerance)"
  * contract instead: the sketch answer must sit within its configured
  * error bound of the exact answer on the fixture.
  */
class SketchSanitySpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct within its 2% rsd of exact per group") {
    val apx = AggQueries.approxDistinct(spark, sf("sf0.01"))
      .as[(String, Long)].collect().toMap
    val exact = graft.core.Tables.t(spark, sf("sf0.01"), "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .as[(String, Long)].collect().toMap
    assert(apx.keySet === exact.keySet)
    exact.foreach { case (flag, nd) =>
      val rel = math.abs(apx(flag) - nd).toDouble / nd
      // rsd 0.02 → ~3-sigma bound 6%
      assert(rel < 0.06, s"group $flag: approx ${apx(flag)} vs exact $nd (rel $rel)")
    }
  }

  test("approx_percentile brackets the exact percentile within neighboring ranks") {
    val apx = AggQueries.approxPercentile(spark, sf("sf0.01"))
      .as[(String, Double, Double)].collect()
      .map { case (k, p50, p95) => k -> (p50, p95) }.toMap
    val li = graft.core.Tables.t(spark, sf("sf0.01"), "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.95))").as("p"))
      .select(col("l_returnflag"),
        element_at(col("p"), 1).as("p50"), element_at(col("p"), 2).as("p95"))
      .as[(String, Double, Double)].collect()
      .map { case (k, p50, p95) => k -> (p50, p95) }.toMap
    apx.foreach { case (flag, (a50, a95)) =>
      val (e50, e95) = exact(flag)
      // accuracy 1000 → rank error ≤ n/1000; prices span ~[900, 105k]:
      // a 2% relative value tolerance comfortably covers it on this data
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$flag p50 $a50 vs $e50")
      assert(math.abs(a95 - e95) / e95 < 0.02, s"$flag p95 $a95 vs $e95")
    }
  }
}
