package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Brute-force reference properties for the as-of direction trio:
  * backward (last ≤ t, tie → max tie-break), forward (first ≥ t, tie →
  * min tie-break), nearest (min |Δt|, equidistant → backward) — on
  * random small frames with deliberate timestamp collisions.
  */
object AsOfJoinProps extends Properties("asof") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val genLeft = Gen.listOfN(15,
    Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 20L)))
  private val genRight = Gen.listOfN(15,
    Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 20L)))

  // value doubles as the tie-break: backward picks max, forward min
  private def run(
      which: String, ls: List[(Long, Long)], rs: List[(Long, Long)]) = {
    import spark.implicits._
    val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "t", "lid")
    val right = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toDouble) }
      .toDF("k", "t", "v")
    val out = which match {
      case "back" => AsOfJoin.asOf(left, right, "k", "t", "k", "t",
        Seq("v" -> "mv"), rightTieBreak = Some("v"))
      case "fwd" => AsOfJoin.asOfForward(left, right, "k", "t", "k", "t",
        Seq("v" -> "mv"), rightTieBreak = Some("v"))
      case "near" => AsOfJoin.asOfNearest(left, right, "k", "t", "k", "t",
        Seq("v" -> "mv"), rightTieBreak = Some("v"))
    }
    out.select($"lid", $"mv").as[(Long, Option[Double])].collect().toMap
  }

  private def bruteBack(k: Long, t: Long, rs: List[(Long, Long)]): Option[Double] = {
    val c = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == k && rt <= t }
    if (c.isEmpty) None else {
      val mt = c.map(_._1._2).max
      Some(c.filter(_._1._2 == mt).map(_._2.toDouble).max) // max tie-break
    }
  }

  private def bruteFwd(k: Long, t: Long, rs: List[(Long, Long)]): Option[Double] = {
    val c = rs.zipWithIndex.filter { case ((rk, rt), _) => rk == k && rt >= t }
    if (c.isEmpty) None else {
      val mt = c.map(_._1._2).min
      Some(c.filter(_._1._2 == mt).map(_._2.toDouble).min) // min tie-break
    }
  }

  property("backward as-of matches brute force (with ties)") =
    forAll(genLeft, genRight) { (ls, rs) =>
      val out = run("back", ls, rs)
      ls.zipWithIndex.forall { case ((k, t), i) =>
        out(i.toLong) == bruteBack(k, t, rs)
      }
    }

  property("forward as-of matches brute force (with ties)") =
    forAll(genLeft, genRight) { (ls, rs) =>
      val out = run("fwd", ls, rs)
      ls.zipWithIndex.forall { case ((k, t), i) =>
        out(i.toLong) == bruteFwd(k, t, rs)
      }
    }

  property("nearest as-of = closer of the two sides, backward on ties") =
    forAll(genLeft, genRight) { (ls, rs) =>
      val out = run("near", ls, rs)
      ls.zipWithIndex.forall { case ((k, t), i) =>
        val bt = rs.filter(r => r._1 == k && r._2 <= t).map(_._2).maxOption
        val ft = rs.filter(r => r._1 == k && r._2 >= t).map(_._2).minOption
        val expect = (bt, ft) match {
          case (None, None) => None
          case (Some(_), None) => bruteBack(k, t, rs)
          case (None, Some(_)) => bruteFwd(k, t, rs)
          case (Some(b), Some(f)) =>
            if (t - b <= f - t) bruteBack(k, t, rs) else bruteFwd(k, t, rs)
        }
        out(i.toLong) == expect
      }
    }
}
