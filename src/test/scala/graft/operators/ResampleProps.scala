package graft.operators

import java.sql.Timestamp

import graft.core.Det
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Properties of the resample family: the grid is exactly the closed
  * hourly span of the data, no rows are lost or invented, and each gap
  * strategy fills from the right neighbours.
  */
object ResampleProps extends Properties("resample") {

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

  private val genEvent: Gen[(Int, Int, Double)] = for {
    hour <- Gen.choose(0, 20)      // sparse → real gaps
    minute <- Gen.choose(0, 59)
    value <- Gen.choose(-100.0, 100.0)
  } yield (hour, minute, value)

  private def toDf(events: List[(Int, Int, Double)]) = {
    import spark.implicits._
    events.map { case (h, m, v) =>
      (Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00"), v)
    }.toDF("ts", "v")
  }

  property("grid covers the span; counts and sums are conserved") =
    forAll(Gen.nonEmptyListOf(genEvent)) { events =>
      import spark.implicits._
      val df = toDf(events)
      val out = Resample.resample(df, "ts", "hour", "INTERVAL 1 HOUR",
          aggs = Seq((count(lit(1)), "n"), (Det.dsum(col("v")), "s")),
          fills = Map("n" -> lit(0L), "s" -> lit(0.0)))
        .as[(Timestamp, Long, Double)].collect()
      val hours = events.map(_._1)
      val gridOk = out.length == hours.max - hours.min + 1 &&
        out.sliding(2).forall {
          case Array(a, b) => b._1.getTime - a._1.getTime == 3600 * 1000L
          case _ => true
        }
      gridOk && out.map(_._2).sum == events.length
    }

  property("LOCF gap rows equal the last non-gap value before them") =
    forAll(Gen.nonEmptyListOf(genEvent)) { events =>
      import spark.implicits._
      val out = Resample.resampleLocf(toDf(events), "ts", "hour",
          "INTERVAL 1 HOUR", Det.dsum(col("v")), "v")
        .as[(Timestamp, Double, Boolean)].collect()
      var lastObserved = Double.NaN
      out.forall { case (_, v, wasGap) =>
        if (!wasGap) { lastObserved = v; true }
        else v == lastObserved // grid starts at an observation → never NaN
      }
    }

  property("interpolated gap values lie between their neighbours") =
    forAll(Gen.nonEmptyListOf(genEvent)) { events =>
      import spark.implicits._
      val out = Resample.resampleInterpolate(toDf(events), "ts", "hour",
          "INTERVAL 1 HOUR", Det.dsum(col("v")), "v")
        .as[(Timestamp, Double, Boolean)].collect()
      val obs = out.filter(!_._3).map(r => (r._1.getTime, r._2))
      out.filter(_._3).forall { case (t, v, _) =>
        val prev = obs.filter(_._1 < t.getTime).maxBy(_._1)
        val next = obs.filter(_._1 > t.getTime).minBy(_._1)
        val lo = math.min(prev._2, next._2) - 1e-9
        val hi = math.max(prev._2, next._2) + 1e-9
        v >= lo && v <= hi
      }
    }

  private val genKeyedEvents: Gen[List[(String, Int, Int, Double)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.oneOf("k1", "k2", "k3")
      e <- genEvent
    } yield (key, e._1, e._2, e._3))

  property("per-key interpolation equals global interpolation of each key") =
    forAll(genKeyedEvents) { events =>
      import spark.implicits._
      val df = events.map { case (k, h, m, v) =>
        (k, Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00"), v)
      }.toDF("k", "ts", "v")
      val keyed = Resample.resampleInterpolateByKey(df, "k", "ts", "hour",
          "INTERVAL 1 HOUR", Det.dsum(col("v")), "v")
        .as[(String, Timestamp, Double, Boolean)].collect().toSeq
      val perKey = events.map(_._1).distinct.sorted.flatMap { k =>
        Resample.resampleInterpolate(df.filter(col("k") === k), "ts", "hour",
            "INTERVAL 1 HOUR", Det.dsum(col("v")), "v")
          .as[(Timestamp, Double, Boolean)].collect().toSeq
          .map { case (t, v, g) => (k, t, v, g) }
      }
      keyed == perKey
    }
}
