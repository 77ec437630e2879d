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
}
