package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — "how many users did
  * A, then B after their first A, then C after that" — the signature
  * event-analytics question a time-series engine answers (the
  * reference's rows ARE such events; it just has no verb for this).
  *
  * Semantics (the deterministic min-chain): a user reaches step k iff
  * they have an event of step k's type at or after the timestamp at
  * which they reached step k−1; the reach time of step k is the
  * EARLIEST such event. Min-based chaining makes the result exactly
  * reproducible in SQL — no per-user sequence scan, no session
  * heuristics — and inclusive `>=` boundaries keep the reference's
  * inclusive time semantics (a same-instant A and B count as ordered).
  *
  * Scale shape: one filtered groupBy per step plus an equi-join per
  * step transition, ALL keyed on the user column — every exchange
  * shares the same partitioning (one real shuffle re-used down the
  * chain under AQE; bucketed storage on the user key would remove it
  * entirely), aggregates are partial before their exchanges, and the
  * step frames shrink monotonically (each join's right side is the
  * previous survivors). Nothing is ever collected to the driver.
  */
object Funnel {

  /** Per-step reach counts for the ordered funnel `steps`.
    *
    * @param within optional conversion HORIZON, e.g. `Some("24 hours")`:
    *   every step must complete within this interval of the user's
    *   FIRST-step reach time (the product-analytics convention — a
    *   purchase three weeks after the view is not that view's
    *   conversion). None = unbounded, the pure ordered chain.
    * @return (step_no INT starting at 1, step STRING, users BIGINT) —
    *         one row per step, monotonically non-increasing counts.
    */
  def funnelCounts(
      df: DataFrame,
      userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String],
      within: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = df.select(col(userCol).as("__u"), col(typeCol).as("__et"),
      col(tsCol).as("__t"))
    // reached(k): (user, earliest ts completing steps 0..k, step-1 ts)
    val first = e.filter(col("__et") === steps.head)
      .groupBy(col("__u")).agg(min(col("__t")).as("__rt"))
      .withColumn("__t1", col("__rt"))
    val reached = steps.tail.scanLeft(first) {
      case (prev, step) =>
        val inHorizon = within
          .map(iv => col("__t") <= col("__prev_t1") + expr(s"INTERVAL $iv"))
          .getOrElse(lit(true))
        e.filter(col("__et") === step)
          .join(prev.select(col("__u"), col("__rt").as("__prev_rt"),
            col("__t1").as("__prev_t1")), Seq("__u"))
          .filter(col("__t") >= col("__prev_rt") && inHorizon)
          .groupBy(col("__u")).agg(min(col("__t")).as("__rt"),
            min(col("__prev_t1")).as("__t1")) // constant per user
    }
    reached.zip(steps).zipWithIndex.map { case ((r, step), i) =>
      r.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step_no"), lit(step).as("step"), col("users"))
    }.reduce(_ union _)
  }
}
