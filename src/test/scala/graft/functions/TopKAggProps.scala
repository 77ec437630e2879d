package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property check for the bounded-heap top-k aggregate: for any input
  * (including duplicate scores, duplicate ids, NaN/null scores, and any
  * partitioning — partial/merge paths exercised by repartition), the
  * aggregate must equal the reference semantics "sort by (score desc,
  * id asc), drop NaN/null, take k".
  */
object TopKAggProps extends Properties("topKByScore") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genRow: Gen[(Int, Long, Double)] = for {
    g <- Gen.choose(0, 2)
    id <- Gen.choose(0L, 20L)
    score <- Gen.oneOf(
      Gen.choose(-5.0, 5.0),
      Gen.oneOf(0.0, 1.0, 1.0, Double.NaN)) // force ties and NaNs
  } yield (g, id, score)

  property("agg == sorted-take-k reference, any partitioning") =
    forAll(Gen.listOfN(40, genRow), Gen.choose(1, 6), Gen.choose(1, 7)) {
      (rows, k, parts) =>
        import spark.implicits._
        val df = rows.toDF("g", "id", "score").repartition(parts)
        val got = df.groupBy($"g")
          .agg(NativeExpressions.topKByScore($"score", $"id", k).as("tk"))
          .select($"g", $"tk")
          .as[(Int, Seq[(Double, Long)])].collect().toMap
        val want = rows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.collect { case (_, id, s) if !s.isNaN => (s, id) }
            .sortBy { case (s, id) => (-s, id) }.take(k)
        }
        val ok = want.forall { case (g, exp) =>
          got.get(g).map(_.toList).contains(exp)
        } && got.keySet == want.keySet
        if (!ok) println(s"k=$k parts=$parts\n got=$got\nwant=$want")
        ok
    }
}
