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

  /** Distribution-drift report between two samples of a numeric column
    * over FIXED literal bin boundaries — the dataset-monitoring
    * primitive a training pipeline runs before mixing a new crawl into
    * an established corpus (has the length/quality distribution moved?).
    *
    * `bounds` (b_0 < … < b_{m-1}) define m+1 bins: (-inf, b_0),
    * [b_0, b_1), …, [b_{m-1}, +inf). Output: one row per NON-EMPTY bin
    * with exact counts (bin_id, n_a, n_b), plus two whole-report
    * columns repeated per row:
    *  - `chi2`: the chi-squared-style divergence Σ (p_a − p_b)² /
    *    (p_a + p_b) over non-empty bins. Every term is elementary IEEE
    *    arithmetic on exact inputs (each proportion is ONE correctly-
    *    rounded division of exact integers) and the sum is an ORDERED
    *    bin-ascending fold — so the statistic is bit-reproducible in an
    *    external oracle, unlike any log-based measure (ln is 1-ulp
    *    divergent cross-engine; same trade as d14/d23).
    *  - `psi_drifted`: the PSI verdict Σ (p'_a − p'_b) ln(p'_a / p'_b)
    *    > threshold over the observed bins, on Laplace-smoothed
    *    proportions p' = (n + ½) / (N + (m+1)/2) so a bin empty on ONE
    *    side (ln 0 otherwise) is well-defined. The PSI VALUE
    *    stays out of the output (ln); the boolean is stable because
    *    ulp-level divergence cannot flip a comparison against a
    *    threshold parted from psi by many orders of magnitude.
    *
    * Scale shape: two map-side bin assignments (a comparison against a
    * broadcast-free literal array) and two m-key aggregations; the fold
    * runs over one collected m-row array on a single tiny partition BY
    * CONSTRUCTION (m is a config constant). No data-sized shuffle
    * beyond the two per-bin counts.
    */
  def driftReport(
      a: DataFrame, b: DataFrame, valueCol: String, bounds: Seq[Long],
      psiThreshold: Double = 0.2): DataFrame = {
    require(bounds.nonEmpty, "driftReport needs at least one bin bound")
    require(bounds == bounds.sorted && bounds.distinct == bounds,
      "bounds must be strictly increasing")
    val arr = array(bounds.map(lit): _*)
    def binned(df: DataFrame, cnt: String): DataFrame = df
      .filter(col(valueCol).isNotNull)
      .withColumn("bin_id", size(filter(arr, bd => bd <= col(valueCol))))
      .groupBy(col("bin_id")).agg(count(lit(1)).as(cnt))
    val nBins = bounds.size + 1
    val joined = binned(a, "n_a").join(binned(b, "n_b"), Seq("bin_id"),
        "full_outer")
      .select(col("bin_id"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // whole-report fold: one row of bin-ascending (n_a, n_b) structs —
    // the array_sort(collect_list) pins the fold order (d23 pattern)
    val folded = joined
      .agg(array_sort(collect_list(struct(col("bin_id"), col("n_a"),
        col("n_b")))).as("bins"))
      .select(col("bins"),
        aggregate(col("bins"), lit(0L), (acc, x) => acc + x("n_a")).as("tot_a"),
        aggregate(col("bins"), lit(0L), (acc, x) => acc + x("n_b")).as("tot_b"))
      .select(col("bins"),
        aggregate(col("bins"), lit(0.0), (acc, x) => {
          val pa = x("n_a").cast("double") / col("tot_a").cast("double")
          val pb = x("n_b").cast("double") / col("tot_b").cast("double")
          acc + when(x("n_a") + x("n_b") === 0L, lit(0.0))
            .otherwise((pa - pb) * (pa - pb) / (pa + pb))
        }).as("chi2"),
        aggregate(col("bins"), lit(0.0), (acc, x) => {
          val pa = (x("n_a").cast("double") + lit(0.5)) /
            (col("tot_a").cast("double") + lit(nBins * 0.5))
          val pb = (x("n_b").cast("double") + lit(0.5)) /
            (col("tot_b").cast("double") + lit(nBins * 0.5))
          acc + (pa - pb) * log(pa / pb)
        }).as("psi"))
    joined.crossJoin(broadcast(folded.select(col("chi2"),
        (col("psi") > psiThreshold).as("psi_drifted"))))
      .orderBy(col("bin_id"))
  }
}
