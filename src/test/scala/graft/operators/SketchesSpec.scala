package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("union of per-bucket HLL sketches equals the direct sketch estimate") {
    val ev = Tables.t(spark, sf(), "events")
      .withColumn("day", date_trunc("day", col("ts")))
    // per-(day, type) sketches, merged down to per-type
    val perBucket = Sketches.hllPerGroup(ev, Seq("day", "event_type"), "user_id")
    val viaMerge = Sketches.hllMergeEstimate(perBucket, Seq("event_type"))
      .orderBy($"event_type")
      .as[(String, Long)].collect().toSeq
    val direct = Sketches.hllDirect(ev, Seq("event_type"), "user_id")
      .orderBy($"event_type")
      .as[(String, Long)].collect().toSeq
    assert(viaMerge === direct) // lossless merge: identical registers
    // and the estimate is a sane approximation of the exact count
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .orderBy($"event_type").as[(String, Long)].collect().toMap
    viaMerge.foreach { case (t, est) =>
      val n = exact(t).toDouble
      assert(math.abs(est - n) / n < 0.1, s"$t: est $est vs exact $n")
    }
  }

  test("global merge (no keys) works and matches direct") {
    val ev = Tables.t(spark, sf(), "events")
      .withColumn("day", date_trunc("day", col("ts")))
    val perDay = Sketches.hllPerGroup(ev, Seq("day"), "user_id")
    val merged = Sketches.hllMergeEstimate(perDay, Seq.empty)
      .as[Long].head()
    val direct = Sketches.hllDirect(ev, Seq.empty, "user_id").as[Long].head()
    assert(merged === direct)
  }
}
