package graft.operators

import graft.SparkSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  /** Reference Morton interleave for cross-checking the column form. */
  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue2 matches the reference interleave over a bit-pattern sweep") {
    val pairs = for {
      a <- Seq(0L, 1L, 2L, 3L, 0x155L, 0x2AAL, 0x3FFL, 777L)
      b <- Seq(0L, 1L, 3L, 0x2AAL, 0x155L, 0x3FFL, 321L)
    } yield (a, b)
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zValue2($"a", $"b", 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === mortonRef(a, b, 10), s"z($a,$b)")
    }
    // interleave is a bijection on the 20-bit square: distinct inputs →
    // distinct outputs, and the output stays within 2*bits bits
    assert(got.map(_._3).distinct.length === pairs.length)
    assert(got.forall(t => t._3 >= 0L && t._3 < (1L << 20)))
  }

  test("scaleToBits clamps outliers and maps the domain onto [0, 2^bits)") {
    val vals = Seq(-5L, 0L, 1L, 499L, 999L, 1000L, 5000L).toDF("v")
      .select(Layout.scaleToBits($"v", 0L, 999L, 8).as("s"))
      .as[Long].collect().toSeq
    assert(vals.forall(s => s >= 0L && s < 256L))
    assert(vals.head === 0L)   // below min clamps to min
    assert(vals.last === 255L) // above max clamps to max
    assert(vals === vals.sorted, "scaling must be monotone")
    // exactness beyond double's 2^53: a µs-scale domain times 2^16
    // overflows fp-exact range; integral div must not round
    val ns = Seq(1704067200000000L, 1706745599999999L).toDF("v")
      .select(Layout.scaleToBits($"v", 1704067200000000L, 1706745599999999L, 16).as("s"))
      .as[Long].collect().toSeq
    assert(ns === Seq(0L, 65535L))
    intercept[IllegalArgumentException](Layout.scaleToBits(lit(0L), 0L, -1L, 8))
    intercept[IllegalArgumentException](Layout.scaleToBits(lit(0L), 0L, 10L, 40))
  }

  test("z-order bounds BOTH dimensions per chunk; single-column sort does not") {
    val ev = Tables.t(spark, sf(), "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"))
    val (uMin, uMax, tMin, tMax) = ev
      .agg(min($"user_id"), max($"user_id"), min($"ts_us"), max($"ts_us"))
      .as[(Long, Long, Long, Long)].head()

    // spans of each dimension within each of 16 contiguous chunks of
    // the sorted order, as a fraction of the dimension's domain
    def chunkSpans(sorted: org.apache.spark.sql.DataFrame, orderCol: String)
        : (Double, Double) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
      val spans = sorted
        .withColumn("chunk", ntile(16).over(w))
        .groupBy($"chunk")
        .agg((max($"user_id") - min($"user_id")).as("us"),
          (max($"ts_us") - min($"ts_us")).as("ts"))
        .agg(avg($"us"), avg($"ts"))
        .as[(Double, Double)].head()
      (spans._1 / (uMax - uMin).toDouble, spans._2 / (tMax - tMin).toDouble)
    }

    val z = Layout.zOrderBy(ev, "user_id", uMin, uMax, "ts_us", tMin, tMax, bits = 10)
    val (zU, zT) = chunkSpans(z, "zval")
    // 16 chunks ≈ top 4 z bits = 2 high bits per dimension → each chunk
    // confined to ~1/4 of each domain (boundary chunks straddle)
    assert(zU <= 0.5 && zT <= 0.5,
      s"z-order chunk spans too wide: user=$zU ts=$zT")

    val naive = ev.orderBy($"user_id")
    val (nU, nT) = chunkSpans(naive, "user_id")
    assert(nT >= 0.9, s"single-column sort should leave ts unbounded, got $nT")
    assert(zT < nT / 2,
      s"z-order must bound the second dimension far better: $zT vs $nT")
  }
}
