package graft.plans

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (InjectRuntimeFilter) — a scale
  * feature the fixtures are too small to trigger by default: when a
  * fact-fact shuffle join has a selective predicate on one side, Spark
  * builds a bloom filter of the surviving keys and applies it to the
  * other side's scan, cutting the shuffled fact volume before the join.
  * The thresholds here are lowered so the 60 k-row fixture takes the
  * same plan path a 100 TB table would (SCALE.md §2). */
class RuntimeFilterSpec extends SparkSuite {

  test("selective side of a shuffle join injects a bloom filter into the fact scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    try {
      val l = Tables.t(spark, sf(), "lineitem")
      val o = Tables.t(spark, sf(), "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter (might_contain) in:\n$optimized")
      // and the filtered result is still correct
      val viaBloom = joined.orderBy(col("l_returnflag"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plainJoin = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(viaBloom === plainJoin)
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
