package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

class SketchAggsSpec extends SparkSuite {

  test("cms_dense rejects a non-string key at ANALYSIS time") {
    // update() casts the key to UTF8String — without the type check this
    // would surface as an opaque executor-side ClassCastException
    val e = intercept[AnalysisException] {
      spark.range(5).agg(SketchAggs.cmsDense(col("id"), 2, 8)).collect()
    }
    assert(e.getMessage.contains("cms_dense"))
  }

  test("vec_sum rejects a non-array<bigint> input at ANALYSIS time") {
    val e = intercept[AnalysisException] {
      spark.range(5).agg(SketchAggs.vecSum(col("id"))).collect()
    }
    assert(e.getMessage.contains("vec_sum"))
    // array of the wrong element type is rejected too
    val e2 = intercept[AnalysisException] {
      spark.range(5).select(array(col("id").cast("double")).as("a"))
        .agg(SketchAggs.vecSum(col("a"))).collect()
    }
    assert(e2.getMessage.contains("vec_sum"))
  }

  test("bucket_stats partial-buffer protocol: serialize/deserialize/merge/eval") {
    // the observe accumulator ships partials through serialize() only on
    // a REAL cluster (local mode passes objects), so the codec must be
    // pinned directly — an executor-side bug here would never show in
    // local tests but would corrupt every sidecar at deployment
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = BucketStatsAgg(
      BoundReference(0, StringType, nullable = true),
      BoundReference(1, StringType, nullable = true), 12, 4, 64,
      bloomKeys = 64L, bloomFpp = 0.03)
    def row(b: String, k: String) = InternalRow(
      if (b == null) null else UTF8String.fromString(b),
      if (k == null) null else UTF8String.fromString(k))
    val b1 = agg.createAggregationBuffer()
    Seq(("h1", "a"), ("h1", "b"), ("h2", "a"), ("h1", null), (null, "x"))
      .foreach { case (b, k) => agg.update(b1, row(b, k)) }
    val b2 = agg.createAggregationBuffer()
    Seq(("h1", "a"), ("h3", "c")).foreach { case (b, k) => agg.update(b2, row(b, k)) }

    // round-trip BOTH partials through the wire codec, then merge
    val m = agg.merge(
      agg.deserialize(agg.serialize(b1)),
      agg.deserialize(agg.serialize(b2)))
    val rows = agg.eval(m)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val byBucket = (0 until rows.numElements()).map { i =>
      val r = rows.getStruct(i, 7)
      r.getUTF8String(0).toString ->
        ((r.getLong(2), r.getBinary(1), r.getArray(3).toLongArray(),
          if (r.isNullAt(4)) null else r.getUTF8String(4).toString,
          if (r.isNullAt(5)) null else r.getUTF8String(5).toString,
          if (r.isNullAt(6)) null else r.getBinary(6)))
    }.toMap
    // n counts all rows incl. the null-key one; null bucket dropped
    assert(byBucket.keySet === Set("h1", "h2", "h3"))
    assert(byBucket("h1")._1 === 4L) // a, b, null-key, a(from b2)
    assert(byBucket("h2")._1 === 1L)
    assert(byBucket("h3")._1 === 1L)
    // HLL survives the round-trip: distinct keys of h1 = {a, b}
    import org.apache.datasketches.hll.HllSketch
    assert(Math.round(HllSketch.heapify(byBucket("h1")._2).getEstimate) === 2L)
    // CMS mass per depth row = non-null key count (null-key skipped)
    val cm = byBucket("h1")._3
    (0 until 4).foreach { d =>
      assert(cm.slice(d * 64, (d + 1) * 64).sum === 3L,
        s"depth $d mass != 3 non-null keys")
    }
    // key min/max survive the round-trip + merge (null keys skipped)
    assert(byBucket("h1")._4 === "a" && byBucket("h1")._5 === "b")
    assert(byBucket("h3")._4 === "c" && byBucket("h3")._5 === "c")
    // the bloom covers exactly the bucket's own keys across both
    // partials; keys of OTHER buckets are (at fpp=3%/64-cap sizing)
    // absent — no false negatives is the property pruning rests on
    val bl = SketchAggs.bloomFromBytes(byBucket("h1")._6)
    for (k <- Seq("a", "b"))
      assert(bl.mightContainBinary(k.getBytes("UTF-8")), s"h1 bloom missing $k")
    assert(!bl.mightContainBinary("c".getBytes("UTF-8")))
  }

  test("adaptive vector codec round-trips sparse and dense buffers") {
    val sparse = Array.fill(1000)(0L)
    sparse(3) = 7L; sparse(999) = -2L
    val dense = Array.tabulate(8)(i => i.toLong - 3)
    for (buf <- Seq(sparse, dense, Array.empty[Long], Array.fill(6)(0L))) {
      val rt = SketchAggs.deserializeVec(SketchAggs.serializeVec(buf))
      assert(rt.toSeq === buf.toSeq)
    }
    // the sparse form actually engages (and is smaller) for sparse input
    assert(SketchAggs.serializeVec(sparse).length < 8 * sparse.length)
  }
}
