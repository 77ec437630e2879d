package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSuite {
  import spark.implicits._

  test("RRF scores and ranks match the hand computation") {
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val l2 = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val out = Fusion.reciprocalRankFusion(
        Seq("a" -> l1, "b" -> l2), "id", "rank", kConst = 60, topK = 10)
      .orderBy("fused_rank").collect()
    def s(r: Option[Int], v: Option[Int]): Double =
      r.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        v.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
    // 10: 1/61 + 1/62; 20: 1/62 + 1/61 (tie with 10 → id breaks);
    // 30: 1/63; 40: 1/63 (tie → id)
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 20L, 30L, 40L))
    assert(out(0).getDouble(3) === s(Some(1), Some(2)))
    assert(out(1).getDouble(3) === s(Some(2), Some(1)))
    assert(out(2).getDouble(3) === s(Some(3), None))
    assert(out.map(_.getInt(4)).toSeq === Seq(1, 2, 3, 4))
    // single-list membership leaves the other rank null
    assert(out(2).isNullAt(2) && !out(2).isNullAt(1))
  }

  test("topK truncates after fusion, not per list") {
    val l1 = (1 to 50).map(i => (i.toLong, i)).toDF("id", "rank")
    val l2 = (1 to 50).map(i => ((i + 25).toLong, i)).toDF("id", "rank")
    val out = Fusion.reciprocalRankFusion(
      Seq("a" -> l1, "b" -> l2), "id", "rank", topK = 5)
    assert(out.count() === 5)
    // ids in both lists outrank single-list ids of comparable rank
    assert(out.orderBy("fused_rank").head().getLong(0) === 26L)
  }

  test("invalid configurations fail loudly") {
    val l = Seq((1L, 1)).toDF("id", "rank")
    intercept[IllegalArgumentException] {
      Fusion.reciprocalRankFusion(Seq("a" -> l), "id", "rank")
    }
    intercept[IllegalArgumentException] {
      Fusion.reciprocalRankFusion(Seq("a" -> l, "a" -> l), "id", "rank")
    }
    intercept[IllegalArgumentException] {
      Fusion.reciprocalRankFusion(Seq("a" -> l, "b" -> l), "id", "rank",
        kConst = 0)
    }
  }
}
