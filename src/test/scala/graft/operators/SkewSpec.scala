package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted groupBy equals direct groupBy on skewed data") {
    // hot key: 10k rows on one key, few on others
    val df = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 7).map(i => ("cold", i.toLong))).toDF("k", "v")

    val direct = df.groupBy("k").agg(
        sum($"v").as("s"), count(lit(1)).as("n"),
        min($"v").as("mn"), max($"v").as("mx"))
      .orderBy("k").collect()

    val salted = Skew.saltedGroupBy(df, Seq("k"),
        Seq(Skew.sum_($"v", "s"), Skew.count_("n"),
          Skew.min_($"v", "mn"), Skew.max_($"v", "mx")),
        saltBuckets = 16)
      .orderBy("k").collect()

    assert(salted === direct)
  }

  test("salted groupBy tolerates MapType payload columns (excluded from the salt)") {
    val df = (1 to 500).map(i => (if (i % 100 == 0) "cold" else "hot", i.toLong))
      .toDF("k", "v")
      .withColumn("m", map(lit("a"), $"v")) // hash() would reject this
    val direct = df.groupBy("k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    val salted = Skew.saltedGroupBy(df, Seq("k"),
        Seq(Skew.sum_($"v", "s"), Skew.count_("n")), saltBuckets = 8)
      .orderBy("k").collect()
    assert(salted === direct)
  }
}
