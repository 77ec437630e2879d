package graft.operators

import graft.SparkSuite
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), "a"),
    (1L, ts("2024-01-01 12:00:00"), "b"),
    (2L, ts("2024-01-01 09:00:00"), "c"), // no prior right row
    (3L, ts("2024-01-01 10:00:00"), "d")  // equal-ts right row (inclusive)
  ).toDF("k", "t", "tag")

  private lazy val right = Seq(
    (1L, ts("2024-01-01 09:30:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 200.0),
    (2L, ts("2024-01-01 09:30:00"), 300.0), // after left's 09:00
    (3L, ts("2024-01-01 10:00:00"), 400.0)  // exactly at left ts
  ).toDF("k", "t", "v")

  test("as-of picks most recent right row at or before left time") {
    val out = AsOfJoin.asOf(left, right, "k", "t", "k", "t",
      Seq("v" -> "last_v"))
      .select($"tag", $"last_v").as[(String, Option[Double])]
      .collect().toMap
    assert(out("a") === Some(100.0)) // 09:30 <= 10:00
    assert(out("b") === Some(200.0)) // 11:00 <= 12:00
    assert(out("c") === None)        // nothing at or before 09:00
    assert(out("d") === Some(400.0)) // equal ts is INCLUSIVE
  }

  test("forward as-of picks earliest right row at or after left time") {
    val out = AsOfJoin.asOfForward(left, right, "k", "t", "k", "t",
      Seq("v" -> "next_v"))
      .select($"tag", $"next_v").as[(String, Option[Double])]
      .collect().toMap
    assert(out("a") === Some(200.0)) // next at/after 10:00 is 11:00
    assert(out("b") === None)        // nothing at or after 12:00
    assert(out("c") === Some(300.0)) // 09:30 >= 09:00
    assert(out("d") === Some(400.0)) // equal ts is INCLUSIVE
    // backward and forward agree on the inclusive equal-ts row, and
    // disagree exactly where they should on the rest
    val back = AsOfJoin.asOf(left, right, "k", "t", "k", "t",
      Seq("v" -> "last_v"))
      .select($"tag", $"last_v").as[(String, Option[Double])]
      .collect().toMap
    assert(back("d") === out("d"))
  }

  test("forward as-of tie on right timestamp: smallest tiebreak wins") {
    val r2 = Seq(
      (1L, ts("2024-01-01 11:00:00"), 1.0, 10L),
      (1L, ts("2024-01-01 11:00:00"), 2.0, 20L)
    ).toDF("k", "t", "v", "seq")
    val out = AsOfJoin.asOfForward(
        left.filter($"tag" === "a"), r2, "k", "t", "k", "t",
        Seq("v" -> "next_v"), rightTieBreak = Some("seq"))
      .select($"next_v").as[Double].head()
    assert(out === 1.0) // seq 10 < 20 — first in frame order
  }

  test("nearest as-of picks the closer side; equidistant ties go backward") {
    val out = AsOfJoin.asOfNearest(left, right, "k", "t", "k", "t",
      Seq("v" -> "near_v"))
      .select($"tag", $"near_v").as[(String, Option[Double])]
      .collect().toMap
    assert(out("a") === Some(100.0)) // back 30m beats fwd 60m
    assert(out("b") === Some(200.0)) // only backward exists
    assert(out("c") === Some(300.0)) // only forward exists
    assert(out("d") === Some(400.0)) // exact hit
    // equidistant: right at 09:00 and 11:00 around a left row at 10:00
    val l2 = Seq((9L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "tag")
    val r2 = Seq(
      (9L, ts("2024-01-01 09:00:00"), 1.0),
      (9L, ts("2024-01-01 11:00:00"), 2.0)).toDF("k", "t", "v")
    val tie = AsOfJoin.asOfNearest(l2, r2, "k", "t", "k", "t",
      Seq("v" -> "near_v")).select($"near_v").as[Double].head()
    assert(tie === 1.0) // backward wins the tie (pandas semantics)
    // no right rows at all → null, row kept
    val none = AsOfJoin.asOfNearest(l2,
      Seq.empty[(Long, Timestamp, Double)].toDF("k", "t", "v"),
      "k", "t", "k", "t", Seq("v" -> "near_v"))
      .select($"near_v").as[Option[Double]].head()
    assert(none === None)
  }

  test("nearest as-of: DateType distances work; mismatched time types rejected") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    val l = Seq((1L, d("2024-01-10"), "x")).toDF("k", "t", "tag")
    val r = Seq(
      (1L, d("2024-01-07"), 1.0),  // 3 days back
      (1L, d("2024-01-12"), 2.0))  // 2 days forward — nearer
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOfNearest(l, r, "k", "t", "k", "t",
      Seq("v" -> "near_v")).select($"near_v").as[Double].head()
    assert(out === 2.0) // day-granular distance, not a null-ed cast
    // left timestamp vs right date must be rejected, not silently nulled
    val lTs = Seq((1L, ts("2024-01-10 00:00:00"), "x")).toDF("k", "t", "tag")
    intercept[IllegalArgumentException](
      AsOfJoin.asOfNearest(lTs, r, "k", "t", "k", "t", Seq("v" -> "near_v")))
  }

  test("inner as-of drops rows with no prior right row") {
    val out = AsOfJoin.asOfInner(left, right, "k", "t", "k", "t",
      Seq("v" -> "last_v"))
    assert(out.count() === 3)
    assert(!out.select("tag").as[String].collect().contains("c"))
  }

  test("tie on right timestamp resolved by tiebreak column (max wins)") {
    val r2 = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.0, 10L),
      (1L, ts("2024-01-01 09:00:00"), 2.0, 20L)
    ).toDF("k", "t", "v", "seq")
    val out = AsOfJoin.asOf(
      left.filter($"tag" === "a"), r2, "k", "t", "k", "t",
      Seq("v" -> "last_v"), rightTieBreak = Some("seq"))
    assert(out.select("last_v").as[Double].head() === 2.0)
  }

  test("string keys keep their native type (no lossy cast collapsing keys)") {
    val l = Seq(
      ("AAPL", ts("2024-01-01 10:00:00"), "x"),
      ("MSFT", ts("2024-01-01 10:00:00"), "y"),
      ("GOOG", ts("2024-01-01 10:00:00"), "z") // no right row for GOOG
    ).toDF("sym", "t", "tag")
    val r = Seq(
      ("AAPL", ts("2024-01-01 09:00:00"), 1.0),
      ("MSFT", ts("2024-01-01 09:30:00"), 2.0)
    ).toDF("sym", "t", "px")
    val out = AsOfJoin.asOf(l, r, "sym", "t", "sym", "t", Seq("px" -> "last_px"))
      .select($"tag", $"last_px").as[(String, Option[Double])].collect().toMap
    // a cast-to-long key would null all three into one partition and
    // forward-fill MSFT's price into GOOG's row
    assert(out("x") === Some(1.0))
    assert(out("y") === Some(2.0))
    assert(out("z") === None)
  }

  test("mismatched non-numeric key types fail fast") {
    val l = Seq(("1", ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val r = Seq((1.5, ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, "k", "t", "k", "t", Seq("v" -> "last_v"))
    }
  }

  test("mixed integral key widths widen to long") {
    val l = Seq((1, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "tag")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(l, r, "k", "t", "k", "t", Seq("v" -> "last_v"))
    assert(out.select("last_v").as[Option[Double]].head() === Some(7.0))
  }

  test("as-of with tolerance nulls out matches older than the window") {
    val l = Seq((1L, ts("2024-01-01 12:00:00"), "x"),
      (2L, ts("2024-01-01 12:00:00"), "y")).toDF("k", "t", "tag")
    val r = Seq((1L, ts("2024-01-01 09:30:00"), 1.0),   // 2.5h old
      (2L, ts("2024-01-01 11:30:00"), 2.0)).toDF("k", "t", "v")
    val out = AsOfJoin.asOfTolerance(l, r, "k", "t", "k", "t",
        Seq("v" -> "last_v"), tolerance = "1 HOUR")
      .select($"tag", $"last_v").as[(String, Option[Double])].collect().toMap
    assert(out("x") === None)       // match exists but outside tolerance
    assert(out("y") === Some(2.0))  // within tolerance
  }
}
