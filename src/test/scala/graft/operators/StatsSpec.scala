package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("equi-depth histogram: conserved mass, near-equal depths, ordered ranges") {
    val ev = Tables.t(spark, sf(), "events")
    val total = ev.count()
    val h = Stats.equiDepthHistogram(ev, "value", nBuckets = 8)
      .orderBy($"bucket")
      .as[(Int, Long, Double, Double)].collect()
    assert(h.map(_._1).toSeq === (0 until 8))
    assert(h.map(_._2).sum === total)
    // equi-depth: each bucket within 2× of the ideal share (ties at
    // boundaries can shift mass between neighbours, never lose it)
    val ideal = total.toDouble / 8
    h.foreach { case (b, n, _, _) =>
      assert(n > ideal / 2 && n < ideal * 2, s"bucket $b depth $n vs ~$ideal")
    }
    // ranges are ordered and non-overlapping
    h.sliding(2).foreach { case Array((_, _, _, hi1), (_, _, lo2, _)) =>
      assert(hi1 <= lo2)
    }
    intercept[IllegalArgumentException](
      Stats.equiDepthHistogram(ev, "value", nBuckets = 1))
  }

  test("grouped histogram: per-group mass conserved, per-group buckets complete") {
    val ev = Tables.t(spark, sf(), "events")
    val perType = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    val h = Stats.equiDepthHistogramBy(ev, "event_type", "value", nBuckets = 4)
      .orderBy($"event_type", $"bucket")
      .as[(String, Int, Long, Double, Double)].collect()
    val byType = h.groupBy(_._1)
    assert(byType.keySet === perType.keySet)
    byType.foreach { case (t, rows) =>
      assert(rows.map(_._3).sum === perType(t), s"mass lost for $t")
      assert(rows.map(_._2).toSeq.sorted === (0 until 4), s"buckets for $t")
    }
  }

  test("NULL values are excluded from the histogram, not counted into bucket 0") {
    val df = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null, null)
      .toDF("v")
    val h = Stats.equiDepthHistogram(df, "v", nBuckets = 2)
      .as[(Int, Long, Double, Double)].collect()
    assert(h.map(_._2).sum === 4) // the two nulls are not in any bucket
    val g = Stats.equiDepthHistogramBy(
        Seq(("a", java.lang.Double.valueOf(1.0)), ("a", java.lang.Double.valueOf(2.0)),
          ("a", null.asInstanceOf[java.lang.Double])).toDF("g", "v"),
        "g", "v", nBuckets = 2)
      .as[(String, Int, Long, Double, Double)].collect()
    assert(g.map(_._3).sum === 2)
  }

  test("rollingAnomalies flags a spike against its trailing baseline only") {
    // 20 quiet rows (10.00 ± 0.05), then a spike, then quiet again
    val base = (1 to 20).map(i =>
      ("k", new java.sql.Timestamp(i * 60000L), i.toLong,
        10.0 + (if (i % 2 == 0) 0.05 else -0.05)))
    val rows = base ++ Seq(
      ("k", new java.sql.Timestamp(21 * 60000L), 21L, 50.0), // spike
      ("k", new java.sql.Timestamp(22 * 60000L), 22L, 10.0)) // back to quiet
    val got = Stats.rollingAnomalies(
        rows.toDF("k", "ts", "id", "v"), "k", "ts", "v",
        lookback = 20, zThreshold = 3, tieBreak = Seq("id"))
      .select($"id").as[Long].collect().toSet
    // the spike is flagged; row 22 is NOT — its window now contains the
    // spike, widening the baseline stddev
    assert(got === Set(21L))
  }

  test("rollingAnomalies never flags rows with an incomplete baseline") {
    val rows = (1 to 10).map(i =>
      ("k", new java.sql.Timestamp(i * 1000L), i.toLong,
        if (i == 10) 1e6 else 1.0))
    val got = Stats.rollingAnomalies(
        rows.toDF("k", "ts", "id", "v"), "k", "ts", "v",
        lookback = 20, zThreshold = 3, tieBreak = Seq("id"))
      .count()
    assert(got === 0)
  }

  test("rollingAnomalies zero-variance baseline flags any deviation") {
    // identical baseline values -> s = 0 -> any dev² > 0 trips the test
    val rows = (1 to 5).map(i =>
      ("k", new java.sql.Timestamp(i * 1000L), i.toLong, 7.0)) ++
      Seq(("k", new java.sql.Timestamp(6000L), 6L, 7.01))
    val got = Stats.rollingAnomalies(
        rows.toDF("k", "ts", "id", "v"), "k", "ts", "v",
        lookback = 5, zThreshold = 3, tieBreak = Seq("id"))
      .select($"id").as[Long].collect().toSet
    assert(got === Set(6L))
  }

  test("rollingAnomalies plan: one keyed exchange, no join") {
    val ev = Tables.t(spark, sf(), "events")
    val p = Stats.rollingAnomalies(ev, "event_type", "ts", "value",
        tieBreak = Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(event_type".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("grouped histogram fails loudly when group cardinality exceeds maxGroups") {
    val ev = Tables.t(spark, sf(), "events")
    val e = intercept[Exception] {
      Stats.equiDepthHistogramBy(ev, "event_id", "value",
        nBuckets = 2, maxGroups = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("exceeds maxGroups")))
  }

  test("driftReport: identical samples → chi2 exactly 0, no drift verdict") {
    import spark.implicits._
    val xs = (1 to 400).map(_.toLong % 97).toDF("x")
    val out = Stats.driftReport(xs, xs, "x", Seq(20L, 50L, 80L)).collect()
    assert(out.forall(r => r.getLong(1) === r.getLong(2))) // n_a == n_b
    assert(out.forall(_.getDouble(3) === 0.0))             // exact zero
    assert(out.forall(!_.getBoolean(4)))
  }

  test("driftReport: disjoint samples drift; counts and bin edges exact") {
    import spark.implicits._
    val a = (1 to 100).map(_ => 10L).toDF("x")   // all below first bound
    val b = (1 to 100).map(_ => 100L).toDF("x")  // all in a later bin
    val out = Stats.driftReport(a, b, "x", Seq(20L, 50L, 80L))
      .orderBy("bin_id").collect()
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((0, 100L, 0L), (3, 0L, 100L)))
    assert(out.forall(_.getBoolean(4)))          // psi way past 0.2
    assert(out.head.getDouble(3) > 1.9)          // chi2 → 2 for disjoint
    // boundary lands in the UPPER bin: [20,50) starts AT 20
    val edge = Stats.driftReport(Seq(20L).toDF("x"), Seq(19L).toDF("x"),
      "x", Seq(20L, 50L, 80L)).orderBy("bin_id").collect()
    assert(edge.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((0, 0L, 1L), (1, 1L, 0L)))
  }

  test("driftReport rejects unsorted bounds") {
    import spark.implicits._
    val xs = Seq(1L).toDF("x")
    intercept[IllegalArgumentException] {
      Stats.driftReport(xs, xs, "x", Seq(50L, 20L))
    }
  }
}
