package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The 100 TB co-location story: bucketed tables joined on the bucket
  * key must plan WITHOUT a shuffle on either side (storage-partitioned
  * sort-merge join). This is the layout ChronoDB-scale deployments use
  * for fact-fact joins instead of paying an exchange per query. */
class BucketingSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    // default warehouse dir (static conf); ensure clean table slots —
    // drop catalog entries AND any stale managed-table directories left
    // by interrupted runs
    Seq("li_b", "ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(java.nio.file.Files.delete(_))
      }
    }

    graft.core.Tables.t(spark, sf(), "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.core.Tables.t(spark, sf(), "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))

    joined.collect() // force final adaptive plan
    val plan = joined.queryExecution.executedPlan
    val preAggShuffles = collectWithSubqueries(plan) {
      case s: ShuffleExchangeLike => s
    }
    // exactly one shuffle: the tiny post-join groupBy; the join itself
    // must be shuffle-free thanks to bucket co-location
    assert(preAggShuffles.size <= 1,
      s"expected <=1 exchange (agg only), got ${preAggShuffles.size}:\n$plan")

    val direct = graft.core.Tables.t(spark, sf(), "lineitem")
      .join(graft.core.Tables.t(spark, sf(), "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    assert(joined.orderBy("o_orderpriority").collect() ===
      direct.orderBy("o_orderpriority").collect())
  }
}
