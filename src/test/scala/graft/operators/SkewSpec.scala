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

  test("salted join equals plain inner join, row-level, on skewed data") {
    val big = ((1 to 5000).map(i => (1L, i.toLong)) ++          // hot key
      (1 to 50).map(i => (2L, i.toLong)) ++
      Seq((99L, 0L))                                            // no match
    ).toDF("k", "v")
    val small = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "attr")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"v", $"attr").as[(Long, Long, String)]
        .collect().sorted.toSeq
    val plain = rows(big.join(small, Seq("k"), "inner"))
    assert(rows(Skew.saltedJoin(big, small, "k", saltBuckets = 8)) === plain)
    // degenerate single bucket is the plain join
    assert(rows(Skew.saltedJoin(big, small, "k", saltBuckets = 1)) === plain)
  }

  test("salted join spreads the hot key across salt buckets") {
    val big = (1 to 5000).map(i => (1L, i.toLong)).toDF("k", "v")
    val small = Seq((1L, "a")).toDF("k", "attr")
    // the physical join keys must include the salt — that is the whole
    // mechanism (one reducer per (key, salt) instead of per key)
    val p = Skew.saltedJoin(big, small, "k", saltBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p)
    // and the derived salt really fans a hot key out over >1 bucket
    val nBuckets = big.withColumn("__salt",
        pmod(hash($"k", $"v"), lit(8)))
      .select("__salt").distinct().count()
    assert(nBuckets > 1, s"hot key stayed in $nBuckets bucket")
  }
}
