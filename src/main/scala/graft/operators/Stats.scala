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

  /** Rolling z-score anomaly detection over each key's ordered series:
    * flag rows whose value deviates more than `zThreshold` sample
    * standard deviations from the mean of the `lookback` PRECEDING
    * rows (the row itself excluded — including it would let an outlier
    * inflate its own baseline). Rows with fewer than `lookback`
    * predecessors are never flagged (no baseline).
    *
    * The z-test runs in EXACT integer arithmetic — no sqrt, no
    * division, no doubles. With xi the value scaled to an integer
    * (2 decimal places), S1 = Σxi, S2 = Σxi² over the window, n =
    * `lookback`, the test  |x−x̄| > z·s  squares (both sides are
    * nonnegative: s ≥ 0, and |x−x̄| is an absolute value) and clears
    * the n, n−1 denominators of x̄ = S1/n and s² = (S2−S1²/n)/(n−1)
    * into
    *
    *   (n−1)·(n·xi − S1)² > z²·n·(n·S2 − S1²)
    *
    * which is decidable exactly in Long (safe for |xi| up to ~3·10⁷ at
    * n=20 — far beyond any 2-decimal metric column) and therefore
    * reproducible bit for bit by a SQL oracle — a double stddev
    * formulation diverges in ulps across engines and flips boundary
    * rows. Scale shape: ONE window exchange on the key; sum/count over
    * a ROWS frame are O(1)-incremental in WindowExec, so a hot key
    * streams through without frame re-scans.
    */
  def rollingAnomalies(
      df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
      lookback: Int = 20, zThreshold: Int = 3,
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    require(zThreshold >= 1, s"zThreshold must be >= 1, got $zThreshold")
    val order = (col(timeCol) +: tieBreak.map(col)): Seq[org.apache.spark.sql.Column]
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(-lookback, -1)
    val xi = (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(12, 2))
      * 100).cast("long")
    val n = lit(lookback.toLong)
    val dev = n * col("__xi") - col("__s1")
    val varN = n * col("__s2") - col("__s1") * col("__s1")
    df.withColumn("__xi", xi)
      .withColumn("__s1", sum(col("__xi")).over(w))
      .withColumn("__s2", sum(col("__xi") * col("__xi")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") === lookback &&
        lit((lookback - 1).toLong) * dev * dev >
          lit(zThreshold.toLong * zThreshold) * n * varN)
      .drop("__xi", "__s1", "__s2", "__n")
  }
}
