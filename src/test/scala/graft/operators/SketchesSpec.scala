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

  test("Count-Min estimates upper-bound exact counts; split builds merge losslessly") {
    val docs = Tables.t(spark, sf(), "documents")
    val toks = docs.select(explode(
      graft.functions.TextFunctions.tokens($"text")).as("term"))
    val exact = toks.groupBy($"term").agg(count(lit(1)).as("exact_cnt"))
    val sketch = Sketches.cmsBuild(toks, "term", depth = 4, width = 64)
    // counter table is bounded by depth × width regardless of corpus
    assert(sketch.count() <= 4L * 64L)
    // CM guarantee: every estimate >= its exact count (never under)
    val est = Sketches.cmsEstimate(sketch, exact.select($"term"), "term",
      depth = 4, width = 64)
    val joined = est.join(exact, Seq("term"))
      .as[(String, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (t, e, x) => assert(e >= x, s"$t: est $e < exact $x") }
    // mergeability: summing counters of two half-corpus sketches equals
    // the whole-corpus sketch (counters are plain sums)
    val (lo, hi) = (docs.filter($"doc_id" < 250), docs.filter($"doc_id" >= 250))
    def sk(df: org.apache.spark.sql.DataFrame) = Sketches.cmsBuild(
      df.select(explode(graft.functions.TextFunctions.tokens($"text")).as("term")),
      "term", depth = 4, width = 64)
    val mergedHalves = sk(lo).unionByName(sk(hi))
      .groupBy($"d", $"bucket").agg(sum($"cnt").as("cnt"))
      .orderBy($"d", $"bucket").as[(Int, Long, Long)].collect().toSeq
    val whole = sketch.orderBy($"d", $"bucket")
      .as[(Int, Long, Long)].collect().toSeq
    assert(mergedHalves === whole)
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
