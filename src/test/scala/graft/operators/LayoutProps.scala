package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Properties of the Z-order layout key: the interleave is a bijection
  * (deinterleave recovers both coordinates), monotone in each
  * coordinate with the other fixed, and the scaled curve stays inside
  * its 2·bits-bit square for any domain.
  */
object LayoutProps extends Properties("layout") {

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

  private val bits = 8

  private def deinterleave(z: Long): (Long, Long) =
    (0 until bits).foldLeft((0L, 0L)) { case ((a, b), i) =>
      (a | (((z >> (2 * i)) & 1L) << i), b | (((z >> (2 * i + 1)) & 1L) << i))
    }

  private def zOf(pairs: List[(Long, Long)]): List[Long] = {
    import spark.implicits._
    if (pairs.isEmpty) Nil
    else pairs.toDF("a", "b")
      .select(Layout.zValue2(col("a"), col("b"), bits).as("z"))
      .as[Long].collect().toList
  }

  private val coord: Gen[Long] = Gen.choose(0L, (1L << bits) - 1)

  property("deinterleave inverts the column interleave") =
    forAll(Gen.listOfN(12, Gen.zip(coord, coord))) { pairs =>
      zOf(pairs).zip(pairs).forall { case (z, (a, b)) =>
        z >= 0L && z < (1L << (2 * bits)) && deinterleave(z) == ((a, b))
      }
    }

  property("monotone in each coordinate with the other fixed") =
    forAll(Gen.zip(coord, Gen.listOfN(6, coord))) { case (fixed, vs) =>
      val sorted = vs.sorted
      val withAFixed = zOf(sorted.map(v => (fixed, v)))
      val withBFixed = zOf(sorted.map(v => (v, fixed)))
      (withAFixed == withAFixed.sorted) && (withBFixed == withBFixed.sorted)
    }

  private def deinterleave3(z: Long): (Long, Long, Long) =
    (0 until bits).foldLeft((0L, 0L, 0L)) { case ((a, b, c), i) =>
      (a | (((z >> (3 * i)) & 1L) << i),
        b | (((z >> (3 * i + 1)) & 1L) << i),
        c | (((z >> (3 * i + 2)) & 1L) << i))
    }

  private def z3Of(triples: List[(Long, Long, Long)]): List[Long] = {
    import spark.implicits._
    if (triples.isEmpty) Nil
    else triples.toDF("a", "b", "c")
      .select(Layout.zValueN(Seq(col("a"), col("b"), col("c")), bits).as("z"))
      .as[Long].collect().toList
  }

  property("3-D: deinterleave inverts the column interleave") =
    forAll(Gen.listOfN(8, Gen.zip(coord, coord, coord))) { triples =>
      z3Of(triples).zip(triples).forall { case (z, (a, b, c)) =>
        z >= 0L && z < (1L << (3 * bits)) && deinterleave3(z) == ((a, b, c))
      }
    }

  property("3-D: monotone in each coordinate with the others fixed") =
    forAll(Gen.zip(coord, coord, Gen.listOfN(5, coord))) { case (f1, f2, vs) =>
      val sorted = vs.sorted
      Seq[Long => (Long, Long, Long)](
        v => (v, f1, f2), v => (f1, v, f2), v => (f1, f2, v)
      ).forall { shape =>
        val zs = z3Of(sorted.map(shape))
        zs == zs.sorted
      }
    }

  property("3-D: SQL form evaluates bit-identically to the column form") =
    forAll(Gen.listOfN(6, Gen.zip(coord, coord, coord))) { triples =>
      import spark.implicits._
      triples.isEmpty || {
        val df = triples.toDF("a", "b", "c")
        val colZ = df.select(
            Layout.zValueN(Seq(col("a"), col("b"), col("c")), bits).as("z"))
          .as[Long].collect().toList
        val sqlZ = df.selectExpr(
            s"CAST(${Layout.zValueNSql(Seq("a", "b", "c"), bits)} AS BIGINT) AS z")
          .as[Long].collect().toList
        colZ == sqlZ
      }
    }

  property("scaleToBits stays in range and preserves order on any domain") =
    forAll(for {
      min <- Gen.choose(-1000000L, 1000000L)
      width <- Gen.choose(1L, 10000000L)
      vs <- Gen.listOfN(10, Gen.choose(min - 100, min + width + 100))
    } yield (min, min + width - 1, vs)) { case (min, max, vs) =>
      import spark.implicits._
      // carry the input alongside: row order out of a parallel frame is
      // not the input order, so sort by input before checking
      val pairs = vs.toDF("v")
        .select(col("v"), Layout.scaleToBits(col("v"), min, max, bits).as("s"))
        .as[(Long, Long)].collect().sortBy(_._1).toList
      val scaled = pairs.map(_._2)
      scaled.forall(s => s >= 0L && s < (1L << bits)) &&
        scaled == scaled.sorted
    }
}
