package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
  ).toDF("a", "b")

  test("dot product") {
    assert(df.select(VectorFunctions.dot(col("a"), col("b")))
      .as[Double].head() === 32.0)
  }

  test("norm") {
    assert(df.select(VectorFunctions.norm(col("a")))
      .as[Double].head() === math.sqrt(14.0))
  }

  test("cosine of identical vectors is 1") {
    val c = df.select(VectorFunctions.cosine(col("a"), col("a")))
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0; zero vector yields null") {
    val d2 = Seq((Seq(1f, 0f), Seq(0f, 1f)), (Seq(0f, 0f), Seq(1f, 1f)))
      .toDF("a", "b")
    val out = d2.select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Option[Double]].collect()
    assert(out(0) === Some(0.0))
    assert(out(1) === None)
  }

  test("l2 distance") {
    assert(df.select(VectorFunctions.l2Distance(col("a"), col("b")))
      .as[Double].head() === math.sqrt(27.0))
  }
}
