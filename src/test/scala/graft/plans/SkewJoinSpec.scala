package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** AQE skew-join handling (OptimizeSkewedJoin) — the runtime half of the
  * skew story (operators.Skew covers the aggregation half). The fixture
  * is too small to be "skewed" under production thresholds, so the
  * thresholds are lowered until the 60 k-row hot key takes the same plan
  * path a hot key in a 100 TB join would: AQE observes the shuffle-map
  * sizes, splits the oversized partition, and replicates the matching
  * build-side partition — no salting code on the query author's side.
  */
class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // one hot key (0) carrying ~90% of the fact rows + a uniform tail
      // hot key 0 carries 90% of the fact rows; v makes the hot shuffle
      // partition big even after compression (distinct suffixes), and
      // the downstream aggregate is global, not keyed on k — a keyed
      // aggregate would reuse the join's hash partitioning and AQE
      // (correctly) refuses to split a partitioning a consumer needs
      val fact = spark.range(0, 60000)
        .select(when($"id" < 54000, 0L).otherwise($"id" % 97 + 1).as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("v"))
      val dim = spark.range(0, 98).select($"id".as("k"), ($"id" * 7).as("w"))
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length($"v") + $"w").as("s"))
      // collect() (not head(): head builds a separate limited plan and
      // would leave THIS queryExecution un-executed / non-final)
      val row = joined.collect().head
      // correctness unaffected by the split: every fact row matches once
      assert(row.getLong(0) === 60000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split sort-merge join in final AQE plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
