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
