package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, QueryDef, Tables}
import graft.operators.{AsOfJoin, Intervals, Merge, Resample, Scd, Sessionize}

/** Time-series operators: as-of join and gap-filled resample
  * (SURVEY.md §2c Q9, Q26). */
object TimeSeriesQueries {
  import Tables.t

  /** Q9: as-of join — for each click, the user's most recent purchase at
    * or before the click (inclusive, per the reference's inclusive time
    * semantics). Inner form: clicks with no prior purchase are dropped so
    * the oracle is a plain SQL argmax. */
  def asOfQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"))
    AsOfJoin.asOfInner(
        clicks, purchases,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "user_id", rightTime = "ts",
        valueCols = Seq("ts" -> "last_purchase_ts"),
        rightTieBreak = Some("p_event_id"))
      .orderBy(col("event_id"))
  }

  /** Q9b: as-of join with a 2-hour lookback tolerance (inner form). */
  def asOfToleranceQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"))
    AsOfJoin.asOfTolerance(
        clicks, purchases,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "user_id", rightTime = "ts",
        valueCols = Seq("ts" -> "last_purchase_ts"),
        tolerance = "2 HOURS",
        rightTieBreak = Some("p_event_id"))
      .filter(col("last_purchase_ts").isNotNull)
      .orderBy(col("event_id"))
  }

  /** Q9c: FORWARD as-of join — for each click, the user's next purchase
    * at or after the click (pandas direction='forward'; the reference's
    * inclusive bounds mirrored). Inner form → plain SQL argmin oracle.
    * Carrying only the timestamp makes MIN the exact tie-break-free
    * value (same trick as q08's MAX). */
  def asOfForwardQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"))
    AsOfJoin.asOfForward(
        clicks, purchases,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "user_id", rightTime = "ts",
        valueCols = Seq("ts" -> "next_purchase_ts"),
        rightTieBreak = Some("p_event_id"))
      .filter(col("next_purchase_ts").isNotNull)
      .orderBy(col("event_id"))
  }

  /** Q9d: NEAREST as-of join — for each click, the purchase minimizing
    * |Δt| (pandas direction='nearest'; equidistant ties go backward).
    * Inner form; the oracle rebuilds the choice from the backward MAX
    * and forward MIN argmax/argmin with the same µs-truncated distance
    * arithmetic. */
  def asOfNearestQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"))
    AsOfJoin.asOfNearest(
        clicks, purchases,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "user_id", rightTime = "ts",
        valueCols = Seq("ts" -> "nearest_purchase_ts"),
        rightTieBreak = Some("p_event_id"))
      .filter(col("nearest_purchase_ts").isNotNull)
      .orderBy(col("event_id"))
  }

  /** Q26b: LOCF resample, canonical KEYED form — each event_type series
    * gets its own hourly grid and a key-partitioned carry-forward
    * window, so the fill parallelizes over series (the unpartitioned
    * [[Resample.resampleLocf]] single-series utility would run the
    * whole grid through one task). */
  def resampleLocfQ(spark: SparkSession, dir: String): DataFrame =
    Resample.resampleLocfByKey(
      t(spark, dir, "events"), "event_type", "ts", "hour", "INTERVAL 1 HOUR",
      Det.dsum(col("value")), "v")

  /** Q26d: per-key LOCF resample — each user gets its own hourly grid
    * and carry-forward window (partitioned, parallel over keys). */
  def resampleLocfKeyQ(spark: SparkSession, dir: String): DataFrame =
    Resample.resampleLocfByKey(
      t(spark, dir, "events").filter(col("user_id") < 40),
      "user_id", "ts", "hour", "INTERVAL 1 HOUR",
      Det.dsum(col("value")), "v")

  /** Q26c: linearly interpolated resample, canonical KEYED form — gaps
    * blend the neighbouring observations by time fraction, per
    * event_type series with key-partitioned neighbour windows. */
  def resampleInterpQ(spark: SparkSession, dir: String): DataFrame =
    Resample.resampleInterpolateByKey(
      t(spark, dir, "events"), "event_type", "ts", "hour", "INTERVAL 1 HOUR",
      Det.dsum(col("value")), "v")

  /** Q26e: counter delta per bucket — last minus first observation per
    * (user, hour), the PromQL-style rate/delta downsample. Exact
    * cross-engine: both values are raw reads (fully tie-broken
    * row_number picks), and the delta is one double subtraction. */
  def counterDeltaQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withBucket = t(spark, dir, "events")
      .filter(col("user_id") < 40)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("bucket"),
        col("ts"), col("event_id"), col("value"))
    val wAsc = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts"), col("event_id"))
    val wDesc = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts").desc, col("event_id").desc)
    withBucket
      .withColumn("rna", row_number().over(wAsc))
      .withColumn("rnd", row_number().over(wDesc))
      .filter(col("rna") === 1 || col("rnd") === 1)
      .groupBy(col("user_id"), col("bucket"))
      .agg(max(when(col("rna") === 1, col("value"))).as("first_v"),
        max(when(col("rnd") === 1, col("value"))).as("last_v"))
      .withColumn("delta", col("last_v") - col("first_v"))
      .orderBy(col("user_id"), col("bucket"))
  }

  /** Q26: hourly resample of events with gap fill. */
  def resampleQ(spark: SparkSession, dir: String): DataFrame =
    Resample.resample(
      t(spark, dir, "events"),
      timeCol = "ts", unit = "hour", step = "INTERVAL 1 HOUR",
      aggs = Seq(
        (count(lit(1)), "n"),
        (Det.dsum(col("value")), "sum_value")),
      fills = Map("n" -> lit(0L), "sum_value" -> lit(0.0)))

  /** Q26 (OHLC form): daily open/high/low/close bars per event type —
    * one hash aggregate, deterministic first/last via (ts, value)
    * struct ordering (ties at the bucket edge resolve to the
    * smallest/largest value on both engines). */
  def ohlcQ(spark: SparkSession, dir: String): DataFrame =
    Resample.ohlc(t(spark, dir, "events"),
        "event_type", "ts", "value", unit = "day")
      .orderBy(col("event_type"), col("bucket_start"))

  /** Q26 (gap-report form): per-user silences of ≥ 1 day between
    * consecutive events. */
  def gapsQ(spark: SparkSession, dir: String): DataFrame =
    Resample.gaps(t(spark, dir, "events"), "user_id", "ts", "1 DAY")
      .orderBy(col("user_id"), col("gap_start"), col("gap_end"))

  /** Q26 (time-weighted form): per-event_type daily TWAP — LOCF
    * weighting over irregular samples, exact µs weights, Det-exact
    * numerator, one IEEE division (see Resample.twa). */
  def twapQ(spark: SparkSession, dir: String): DataFrame =
    Resample.twa(t(spark, dir, "events"),
        "event_type", "ts", "value", unit = "day")
      .orderBy(col("event_type"), col("bucket_start"))

  /** Q46: ordered funnel view → click → purchase (min-chained reach
    * semantics, inclusive boundaries — see operators.Funnel). */
  def funnelQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnelCounts(t(spark, dir, "events"),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy(col("step_no"))

  /** Q47: weekly retention cohorts — users grouped by the week of
    * their first event; for each later week, how many are still
    * active. Week offsets are exact integer µs arithmetic (UTC-naive
    * truncated weeks are exactly 7 days apart); counts are exact
    * distincts. Scale: first-event and activity frames are both
    * user-keyed (one reusable partitioning), the final rollup is a
    * tiny (cohort, offset) aggregate. */
  def retentionQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val first = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    active.join(first, Seq("user_id"))
      .select(col("cohort_week"),
        ((unix_micros(col("week")) - unix_micros(col("cohort_week")))
          / lit(7L * 86400000000L)).cast("int").as("week_offset"),
        col("user_id"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Q46b: the funnel with a 24-hour conversion horizon from the first
    * step — the product-analytics form (late conversions don't count). */
  def funnelWindowedQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnelCounts(t(spark, dir, "events"),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), within = Some("24 hours"))
      .orderBy(col("step_no"))

  /** Q48: batch sessionization — per-user 30-minute-gap sessions over
    * the event stream (see [[Sessionize]] for the one-shuffle window
    * formulation). event_id breaks timestamp ties so session numbering
    * is deterministic. */
  def sessionizeQ(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessionize(
        t(spark, dir, "events").select(
          col("user_id"), col("ts"), col("event_id")),
        "user_id", "ts", gapUs = 30L * 60 * 1000000, tieBreak = Seq("event_id"))
      .select(col("user_id"), col("session_no"),
        col("session_start"), col("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_no"))

  /** Q49: SCD2 history — each user's event_type stream collapsed into
    * validity intervals [valid_from, valid_to) (see [[Scd]] for the
    * one-shuffle two-window formulation). The final sort adds `state`
    * because two runs CAN share (user_id, valid_from) when distinct
    * states land on the same microsecond. */
  def scd2Q(spark: SparkSession, dir: String): DataFrame =
    Scd.scd2(
        t(spark, dir, "events").select(
          col("user_id"), col("ts"), col("event_id"), col("event_type")),
        "user_id", "ts", "event_type", tieBreak = Seq("event_id"))
      .orderBy(col("user_id"), col("valid_from"), col("state"))

  /** Q50: max concurrent sessions per day — q48's sessions swept by
    * [[Intervals.maxConcurrencyByDay]] (day-clipped closed-interval
    * sweep; the running sum partitions by day, never globally). */
  def concurrencyQ(spark: SparkSession, dir: String): DataFrame =
    Intervals.maxConcurrencyByDay(
        Sessionize.sessionize(
          t(spark, dir, "events").select(
            col("user_id"), col("ts"), col("event_id")),
          "user_id", "ts", gapUs = 30L * 60 * 1000000,
          tieBreak = Seq("event_id")),
        "session_start", "session_end")
      .orderBy(col("day"))

  /** Q51: MERGE-style upsert — the current-state snapshot as of
    * Jan 16 (latest event per user) with the second half of the month
    * applied as a change batch: purchases delete the key, anything
    * else upserts the row, and per key only the LATEST change wins
    * (see [[Merge.applyChanges]] for the dedup-then-full-outer shape
    * and its one-shuffle-per-side scale story). */
  def upsertMergeQ(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(spark, dir, "events")
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    val base = ev.filter(col("ts") < split)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    val changes = ev.filter(col("ts") >= split)
      .withColumn("op",
        when(col("event_type") === "purchase", lit("D")).otherwise(lit("U")))
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        col("op"), col("event_id"))
    Merge.applyChanges(base, changes, "user_id", "ts", "op",
        tieBreak = Seq("event_id"))
      .orderBy(col("user_id"))
  }

  /** Q52: interval overlap join — which sessions of DIFFERENT users
    * were open at the same time (2-hour-gap sessions of the first 40
    * users; the cross-entity concurrency question every incident/
    * attribution analysis asks). [[Intervals.overlapJoin]] grid-buckets
    * both sides so there is NO cartesian — candidates equi-join on the
    * 4-hour cell and each pair is credited in exactly one cell. The
    * session id packs (user, session_no) so the different-user filter
    * is integer arithmetic on the join output. */
  def intervalOverlapQ(spark: SparkSession, dir: String): DataFrame = {
    val sess = Sessionize.sessionize(
        t(spark, dir, "events").filter(col("user_id") < 40)
          .select(col("user_id"), col("ts"), col("event_id")),
        "user_id", "ts", gapUs = 2L * 3600 * 1000000,
        tieBreak = Seq("event_id"))
      .select((col("user_id") * 100000 + col("session_no")).as("sid"),
        col("session_start"), col("session_end"))
    Intervals.overlapJoin(sess, sess, "sid", "sid",
        "session_start", "session_end", gridUs = 4L * 3600 * 1000000)
      .filter(expr("a_id div 100000") < expr("b_id div 100000"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q52_interval_overlap", intervalOverlapQ, Some(
      // sessions rebuilt as in q48 (2-hour gap, user < 40), ids packed
      // user*100000+session_no, then the plain theta join the grid
      // formulation must exactly reproduce; closed-interval overlap
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |         lag(epoch_ns(ts) // 1000) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events WHERE user_id < 40),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev_us IS NULL
        |                OR epoch_ns(ts) // 1000 - prev_us > 7200000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(sum(new_sess) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_no
        |  FROM f),
        |sess AS (
        |  SELECT user_id * 100000 + session_no AS sid,
        |         min(ts) AS s, max(ts) AS e
        |  FROM s GROUP BY user_id, session_no)
        |SELECT a.sid AS a_id, b.sid AS b_id,
        |       greatest(a.s, b.s) AS overlap_start,
        |       least(a.e, b.e) AS overlap_end
        |FROM sess a JOIN sess b
        |  ON a.sid // 100000 < b.sid // 100000
        | AND a.s <= b.e AND b.s <= a.e
        |ORDER BY a_id, b_id""".stripMargin)),
    QueryDef("q51_upsert_merge", upsertMergeQ, Some(
      // base = latest pre-split row per user; ch = latest post-split
      // change per user with its op; MERGE: D deletes, U replaces or
      // inserts, untouched keys keep the base row
      """WITH base AS (
        |  SELECT user_id, ts, event_type, value FROM (
        |    SELECT user_id, ts, event_type, value,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00')
        |  WHERE rn = 1),
        |ch AS (
        |  SELECT user_id, ts, event_type, value,
        |         CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op
        |  FROM (
        |    SELECT user_id, ts, event_type, value, event_id,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
        |  WHERE rn = 1)
        |SELECT coalesce(b.user_id, c.user_id) AS user_id,
        |       CASE WHEN c.op IS NOT NULL THEN c.ts ELSE b.ts END AS ts,
        |       CASE WHEN c.op IS NOT NULL THEN c.event_type
        |            ELSE b.event_type END AS event_type,
        |       CASE WHEN c.op IS NOT NULL THEN c.value ELSE b.value END AS value
        |FROM base b FULL JOIN ch c ON b.user_id = c.user_id
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY user_id""".stripMargin)),
    QueryDef("q49_scd2", scd2Q, Some(
      // run starts: first row per user, or state differs from previous
      // (IS DISTINCT FROM — NULL states collapse like values, mirroring
      // the builder's null-safe <=>); valid_to = next run's start
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |         row_number() OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |c AS (
        |  SELECT user_id, ts, event_id, event_type FROM o
        |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |       lead(ts) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM c
        |ORDER BY user_id, valid_from, state""".stripMargin)),
    QueryDef("q50_max_concurrency", concurrencyQ, Some(
      // q48's sessions -> day-clipped closed-interval sweep: +1/-1
      // boundaries, per-day running sum ordered (ts, delta DESC) so
      // simultaneous starts count before ends (closed intervals), max
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |         lag(epoch_ns(ts) // 1000) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev_us IS NULL
        |                OR epoch_ns(ts) // 1000 - prev_us > 1800000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts,
        |         sum(new_sess) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS session_no
        |  FROM f),
        |sess AS (
        |  SELECT min(ts) AS session_start, max(ts) AS session_end
        |  FROM s GROUP BY user_id, session_no),
        |seg AS (
        |  SELECT d.day,
        |         greatest(session_start, d.day) AS seg_start,
        |         least(session_end,
        |               d.day + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND)
        |           AS seg_end
        |  FROM sess,
        |       unnest(generate_series(date_trunc('day', session_start),
        |                              date_trunc('day', session_end),
        |                              INTERVAL 1 DAY)) AS d(day)),
        |b AS (
        |  SELECT day, seg_start AS ts, 1 AS delta FROM seg
        |  UNION ALL
        |  SELECT day, seg_end AS ts, -1 AS delta FROM seg),
        |r AS (
        |  SELECT day,
        |         sum(delta) OVER
        |           (PARTITION BY day ORDER BY ts, delta DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS running
        |  FROM b)
        |SELECT CAST(day AS DATE) AS day,
        |       CAST(max(running) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY day ORDER BY day""".stripMargin)),
    QueryDef("q48_sessionize", sessionizeQ, Some(
      // gap test on integral µs (epoch_ns // 1000 ≡ Spark unix_micros);
      // session_no = running sum of start flags, BIGINT both sides
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |         lag(epoch_ns(ts) // 1000) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN prev_us IS NULL
        |                OR epoch_ns(ts) // 1000 - prev_us > 1800000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(sum(new_sess) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_no
        |  FROM f)
        |SELECT user_id, session_no,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY 1, 2
        |ORDER BY user_id, session_no""".stripMargin)),
    QueryDef("q46b_funnel_windowed", funnelWindowedQ, Some(
      """WITH s1 AS (
        |  SELECT user_id AS u, min(ts) AS rt, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS rt, min(s1.t1) AS t1
        |  FROM events e JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'click' AND e.ts >= s1.rt
        |    AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS rt
        |  FROM events e JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.rt
        |    AND e.ts <= s2.t1 + INTERVAL 24 HOUR GROUP BY 1)
        |SELECT 1 AS step_no, 'view' AS step,
        |       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS users
        |UNION ALL
        |SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |UNION ALL
        |SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3)
        |ORDER BY step_no""".stripMargin)),
    QueryDef("q47_retention_cohorts", retentionQ, Some(
      """WITH f AS (
        |  SELECT user_id,
        |         CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT user_id,
        |         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        |  FROM events)
        |SELECT f.cohort_week,
        |       CAST((epoch_us(a.week) - epoch_us(f.cohort_week))
        |            // 604800000000 AS INTEGER) AS week_offset,
        |       CAST(count(*) AS BIGINT) AS active_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    QueryDef("q46_funnel", funnelQ, Some(
      """WITH s1 AS (
        |  SELECT user_id AS u, min(ts) AS rt FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS rt
        |  FROM events e JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'click' AND e.ts >= s1.rt GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS rt
        |  FROM events e JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.rt GROUP BY 1)
        |SELECT 1 AS step_no, 'view' AS step,
        |       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS users
        |UNION ALL
        |SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |UNION ALL
        |SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3)
        |ORDER BY step_no""".stripMargin)),
    QueryDef("q30h_twap", twapQ, Some(
      s"""WITH b AS (
         |  SELECT event_type,
         |         CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
         |         ts, value,
         |         lead(ts) OVER (PARTITION BY event_type, date_trunc('day', ts)
         |                        ORDER BY ts, value) AS next_ts
         |  FROM events),
         |w AS (
         |  SELECT event_type, bucket_start, value,
         |         coalesce(epoch_us(next_ts),
         |                  epoch_us(bucket_start + INTERVAL 1 DAY))
         |           - epoch_us(ts) AS w_us
         |  FROM b)
         |SELECT event_type, bucket_start,
         |       CAST(CAST(SUM(CAST(value AS DECIMAL(15,10))
         |                     * CAST(w_us AS DECIMAL(19,0))) AS VARCHAR)
         |            AS DOUBLE)
         |         / CAST(SUM(w_us) AS DOUBLE) AS twa,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM w GROUP BY event_type, bucket_start
         |ORDER BY event_type, bucket_start""".stripMargin)),
    QueryDef("q30f_ohlc_bars", ohlcQ, Some(
      // open/close via rank-1 rows under the same (ts, value) tie order
      // the Spark min_by/max_by struct ordering applies
      """WITH b AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
        |         ts, value,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts, value) AS rn_a,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, value DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, bucket_start,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM b GROUP BY event_type, bucket_start
        |ORDER BY event_type, bucket_start""".stripMargin)),
    QueryDef("q30g_gap_detect", gapsQ, Some(
      """WITH p AS (
        |  SELECT user_id, ts AS gap_start,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap_end
        |  FROM events)
        |SELECT user_id, gap_start, gap_end,
        |       epoch_us(gap_end) - epoch_us(gap_start) AS gap_us
        |FROM p
        |WHERE gap_end IS NOT NULL AND gap_end > gap_start + INTERVAL 1 DAY
        |ORDER BY user_id, gap_start, gap_end""".stripMargin)),
    QueryDef("q08_asof_join", asOfQ, Some(
      """SELECT c.event_id, c.user_id, c.ts, MAX(p.ts) AS last_purchase_ts
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id AND p.event_type = 'purchase' AND p.ts <= c.ts
        |WHERE c.event_type = 'click'
        |GROUP BY c.event_id, c.user_id, c.ts
        |ORDER BY c.event_id""".stripMargin),
      headline = true),
    QueryDef("q09c_asof_forward", asOfForwardQ, Some(
      """SELECT c.event_id, c.user_id, c.ts, MIN(p.ts) AS next_purchase_ts
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id AND p.event_type = 'purchase' AND p.ts >= c.ts
        |WHERE c.event_type = 'click'
        |GROUP BY c.event_id, c.user_id, c.ts
        |ORDER BY c.event_id""".stripMargin)),
    QueryDef("q09d_asof_nearest", asOfNearestQ, Some(
      // distances in µs-truncated epoch (epoch_ns // 1000) to match the
      // engine's µs timestamps; equal distance → backward (<=)
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT c.event_id, MAX(p.ts) AS bt
        |  FROM clicks c JOIN events p
        |    ON p.user_id = c.user_id AND p.event_type = 'purchase' AND p.ts <= c.ts
        |  GROUP BY 1),
        |f AS (
        |  SELECT c.event_id, MIN(p.ts) AS ft
        |  FROM clicks c JOIN events p
        |    ON p.user_id = c.user_id AND p.event_type = 'purchase' AND p.ts >= c.ts
        |  GROUP BY 1)
        |SELECT c.event_id, c.user_id, c.ts,
        |  CASE WHEN ft IS NULL THEN bt
        |       WHEN bt IS NULL THEN ft
        |       WHEN epoch_ns(c.ts) // 1000 - epoch_ns(bt) // 1000
        |         <= epoch_ns(ft) // 1000 - epoch_ns(c.ts) // 1000 THEN bt
        |       ELSE ft END AS nearest_purchase_ts
        |FROM clicks c
        |LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
        |WHERE bt IS NOT NULL OR ft IS NOT NULL
        |ORDER BY c.event_id""".stripMargin)),
    QueryDef("q09b_asof_tolerance", asOfToleranceQ, Some(
      """SELECT c.event_id, c.user_id, c.ts, MAX(p.ts) AS last_purchase_ts
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id AND p.event_type = 'purchase'
        | AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 2 HOUR
        |WHERE c.event_type = 'click'
        |GROUP BY c.event_id, c.user_id, c.ts
        |ORDER BY c.event_id""".stripMargin)),
    QueryDef("q30b_resample_locf", resampleLocfQ, Some(
      s"""WITH agg AS (
         |  SELECT event_type, date_trunc('hour', ts) AS b, COUNT(*) AS n,
         |         ${Det.dsumSql("value")} AS v
         |  FROM events GROUP BY 1, 2),
         |bounds AS (SELECT event_type, MIN(b) AS lo, MAX(b) AS hi FROM agg GROUP BY event_type),
         |grid AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
         |         FROM bounds),
         |j AS (SELECT g.event_type, g.b AS bucket, COALESCE(a.n, 0) AS n, a.v
         |      FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.b = a.b)
         |SELECT event_type, bucket,
         |  last_value(CASE WHEN n > 0 THEN v END IGNORE NULLS)
         |    OVER (PARTITION BY event_type ORDER BY bucket
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
         |  n = 0 AS was_gap
         |FROM j ORDER BY event_type, bucket""".stripMargin)),
    QueryDef("q30e_counter_delta", counterDeltaQ, Some(
      """WITH x AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket, value,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                       ORDER BY ts, event_id) AS rna,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                       ORDER BY ts DESC, event_id DESC) AS rnd
        |  FROM events WHERE user_id < 40)
        |SELECT user_id, bucket,
        |  MAX(CASE WHEN rna = 1 THEN value END) AS first_v,
        |  MAX(CASE WHEN rnd = 1 THEN value END) AS last_v,
        |  MAX(CASE WHEN rnd = 1 THEN value END)
        |    - MAX(CASE WHEN rna = 1 THEN value END) AS delta
        |FROM x WHERE rna = 1 OR rnd = 1
        |GROUP BY user_id, bucket ORDER BY user_id, bucket""".stripMargin)),
    QueryDef("q30d_resample_locf_key", resampleLocfKeyQ, Some(
      s"""WITH agg AS (
         |  SELECT user_id, date_trunc('hour', ts) AS b, COUNT(*) AS n,
         |         ${Det.dsumSql("value")} AS v
         |  FROM events WHERE user_id < 40 GROUP BY 1, 2),
         |bounds AS (SELECT user_id, MIN(b) AS lo, MAX(b) AS hi FROM agg GROUP BY user_id),
         |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
         |         FROM bounds),
         |j AS (SELECT g.user_id, g.b AS bucket, COALESCE(a.n, 0) AS n, a.v
         |      FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.b = a.b)
         |SELECT user_id, bucket,
         |  last_value(CASE WHEN n > 0 THEN v END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY bucket
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
         |  n = 0 AS was_gap
         |FROM j ORDER BY user_id, bucket""".stripMargin)),
    QueryDef("q30c_resample_interp", resampleInterpQ, Some(
      s"""WITH agg AS (
         |  SELECT event_type, date_trunc('hour', ts) AS b, COUNT(*) AS n,
         |         ${Det.dsumSql("value")} AS v
         |  FROM events GROUP BY 1, 2),
         |bounds AS (SELECT event_type, MIN(b) AS lo, MAX(b) AS hi FROM agg GROUP BY event_type),
         |grid AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
         |         FROM bounds),
         |j AS (SELECT g.event_type, g.b AS bucket, COALESCE(a.n, 0) AS n, a.v
         |      FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.b = a.b),
         |sel AS (
         |  SELECT event_type, bucket, n, v,
         |    last_value(CASE WHEN n > 0 THEN v END IGNORE NULLS) OVER wp AS pv,
         |    last_value(CASE WHEN n > 0 THEN bucket END IGNORE NULLS) OVER wp AS pt,
         |    first_value(CASE WHEN n > 0 THEN v END IGNORE NULLS) OVER wn AS nv,
         |    first_value(CASE WHEN n > 0 THEN bucket END IGNORE NULLS) OVER wn AS nt
         |  FROM j
         |  WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wn AS (PARTITION BY event_type ORDER BY bucket
         |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT event_type, bucket,
         |  CASE WHEN n > 0 THEN v
         |       WHEN pt IS NULL THEN nv
         |       WHEN nt IS NULL THEN pv
         |       ELSE pv + (nv - pv) * (CAST(epoch_us(bucket) - epoch_us(pt) AS DOUBLE)
         |                              / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE)) END AS v,
         |  n = 0 AS was_gap
         |FROM sel ORDER BY event_type, bucket""".stripMargin)),
    QueryDef("q30_resample", resampleQ, Some(
      s"""WITH agg AS (
         |  SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
         |         ${Det.dsumSql("value")} AS sum_value
         |  FROM events GROUP BY 1),
         |bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg),
         |grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds)
         |SELECT g.bucket, COALESCE(a.n, 0) AS n, COALESCE(a.sum_value, CAST(0.0 AS DOUBLE)) AS sum_value
         |FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket
         |ORDER BY g.bucket""".stripMargin))
  )
}
