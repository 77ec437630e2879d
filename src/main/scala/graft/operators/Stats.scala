package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-statistics operators — the optimizer-grade summaries a
  * warehouse keeps per column (the reference stores only per-tablet
  * min/max/rowcount, table.go Stats; equi-depth histograms are the next
  * rung: they answer selectivity questions min/max cannot).
  */
object Stats {

  /** Exact equi-depth histogram of a numeric column: `nBuckets` buckets
    * holding ~equal row counts, with per-bucket (n, lo, hi).
    *
    * Scale shape: boundaries are ONE aggregation (exact interior
    * percentiles — the same distributed sort-based aggregate as q25,
    * not a global window; a global ntile/row_number formulation would
    * funnel the whole table through one task). The single-row boundary
    * array then broadcasts, bucket assignment is a map-side count of
    * boundaries strictly below the value (ties land in the lower
    * bucket), and the final per-bucket rollup shuffles `nBuckets` keys.
    * Dyadic `nBuckets` (8, 16, …) keeps the percentile fractions exact
    * binary doubles, so the boundaries — and hence the whole histogram
    * — are reproducible bit for bit in an external oracle.
    *
    * NULLs are excluded: the percentile boundaries already ignore them,
    * so counting null rows (into bucket 0) would silently inflate `n`
    * against boundaries they never shaped.
    */
  def equiDepthHistogram(
      df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 4096,
      s"nBuckets out of range: $nBuckets")
    val rows = df.filter(col(valueCol).isNotNull)
    val ps = (1 until nBuckets).map(i => (i.toDouble / nBuckets).toString)
    val bounds = rows.agg(
      expr(s"percentile($valueCol, array(${ps.mkString(",")}))").as("bounds"))
    rows.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        size(filter(col("bounds"), b => b < col(valueCol))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }

  /** Grouped equi-depth histogram — one histogram per `groupCol` value,
    * the per-key form a warehouse stores as column statistics. Same
    * scale shape (and null exclusion) as [[equiDepthHistogram]] except
    * the boundary table has one row per group (still broadcast — group
    * cardinality is the stats table's size, small by construction) and
    * the assignment join is keyed on the group.
    *
    * The broadcast contract is ENFORCED: if the group count exceeds
    * `maxGroups` the query raises at runtime instead of OOM-ing an
    * executor on the broadcast build. The guard is an `assert_true`
    * folded into the bucket expression over the (small) bounds side —
    * a single extra exchange of at most the stats table, never of `df`.
    * Above the bound, re-shape the job (bucket the histogram build per
    * group shard) rather than raising `maxGroups` past executor memory.
    */
  def equiDepthHistogramBy(
      df: DataFrame, groupCol: String, valueCol: String,
      nBuckets: Int, maxGroups: Int = 100000): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 4096,
      s"nBuckets out of range: $nBuckets")
    val rows = df.filter(col(valueCol).isNotNull)
    val ps = (1 until nBuckets).map(i => (i.toDouble / nBuckets).toString)
    val bounds = rows.groupBy(col(groupCol)).agg(
        expr(s"percentile($valueCol, array(${ps.mkString(",")}))").as("bounds"))
      .withColumn("__ng", count(lit(1)).over(Window.partitionBy()))
    // assert_true is NULL on pass; the coalesce keeps it un-prunable
    // (it must ride along to execution, not be column-pruned away)
    val guard = coalesce(
      assert_true(col("__ng") <= maxGroups,
        concat(lit("equiDepthHistogramBy: group cardinality "), col("__ng"),
          lit(s" exceeds maxGroups=$maxGroups; broadcast bounds would OOM"))
      ).cast("int"), lit(0))
    rows.join(broadcast(bounds), Seq(groupCol))
      .withColumn("bucket",
        size(filter(col("bounds"), b => b < col(valueCol))) + guard)
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }
}
