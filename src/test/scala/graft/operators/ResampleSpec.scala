package graft.operators

import graft.SparkSuite
import graft.core.Det
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  test("resample fills interior gaps with fill values") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 10:15:00"), 1.0),
      (Timestamp.valueOf("2024-01-01 10:45:00"), 2.0),
      // 11:00 hour missing entirely
      (Timestamp.valueOf("2024-01-01 12:05:00"), 4.0)
    ).toDF("ts", "v")
    val out = Resample.resample(df, "ts", "hour", "INTERVAL 1 HOUR",
        aggs = Seq((count(lit(1)), "n"), (Det.dsum(col("v")), "s")),
        fills = Map("n" -> lit(0L), "s" -> lit(0.0)))
      .as[(Timestamp, Long, Double)].collect()
    assert(out.length === 3)
    assert(out(0) === ((Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 3.0)))
    assert(out(1) === ((Timestamp.valueOf("2024-01-01 11:00:00"), 0L, 0.0)))
    assert(out(2) === ((Timestamp.valueOf("2024-01-01 12:00:00"), 1L, 4.0)))
  }

  test("LOCF resample carries last value across gaps") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 10:15:00"), 1.0),
      (Timestamp.valueOf("2024-01-01 10:45:00"), 2.0),
      (Timestamp.valueOf("2024-01-01 12:05:00"), 4.0)
    ).toDF("ts", "v")
    val out = Resample.resampleLocf(df, "ts", "hour", "INTERVAL 1 HOUR",
        Det.dsum(col("v")), "v")
      .as[(Timestamp, Double, Boolean)].collect()
    assert(out(0) === ((Timestamp.valueOf("2024-01-01 10:00:00"), 3.0, false)))
    assert(out(1) === ((Timestamp.valueOf("2024-01-01 11:00:00"), 3.0, true))) // carried
    assert(out(2) === ((Timestamp.valueOf("2024-01-01 12:00:00"), 4.0, false)))
  }

  test("per-key LOCF resample grids and fills each key independently") {
    val df = Seq(
      ("u1", Timestamp.valueOf("2024-01-01 10:30:00"), 1.0),
      ("u1", Timestamp.valueOf("2024-01-01 12:30:00"), 3.0), // u1 gap at 11
      ("u2", Timestamp.valueOf("2024-01-01 20:00:00"), 9.0)  // disjoint span
    ).toDF("k", "ts", "v")
    val out = Resample.resampleLocfByKey(df, "k", "ts", "hour",
        "INTERVAL 1 HOUR", Det.dsum(col("v")), "v")
      .as[(String, Timestamp, Double, Boolean)].collect()
    assert(out.toSeq === Seq(
      ("u1", Timestamp.valueOf("2024-01-01 10:00:00"), 1.0, false),
      ("u1", Timestamp.valueOf("2024-01-01 11:00:00"), 1.0, true),
      ("u1", Timestamp.valueOf("2024-01-01 12:00:00"), 3.0, false),
      ("u2", Timestamp.valueOf("2024-01-01 20:00:00"), 9.0, false)))
  }

  test("per-key interpolated resample blends within each key only") {
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-01 10:30:00"), 3.0),
      // a: 11:00, 12:00 missing → 5.0, 7.0
      ("a", Timestamp.valueOf("2024-01-01 13:30:00"), 9.0),
      ("b", Timestamp.valueOf("2024-01-01 11:30:00"), 100.0),
      // b: 12:00 missing → 100 + (200-100)/2 = 150; never sees a's values
      ("b", Timestamp.valueOf("2024-01-01 13:00:00"), 200.0)
    ).toDF("k", "ts", "v")
    val out = Resample.resampleInterpolateByKey(df, "k", "ts", "hour",
        "INTERVAL 1 HOUR", Det.dsum(col("v")), "v")
      .as[(String, Timestamp, Double, Boolean)].collect()
    assert(out.toSeq === Seq(
      ("a", Timestamp.valueOf("2024-01-01 10:00:00"), 3.0, false),
      ("a", Timestamp.valueOf("2024-01-01 11:00:00"), 5.0, true),
      ("a", Timestamp.valueOf("2024-01-01 12:00:00"), 7.0, true),
      ("a", Timestamp.valueOf("2024-01-01 13:00:00"), 9.0, false),
      ("b", Timestamp.valueOf("2024-01-01 11:00:00"), 100.0, false),
      ("b", Timestamp.valueOf("2024-01-01 12:00:00"), 150.0, true),
      ("b", Timestamp.valueOf("2024-01-01 13:00:00"), 200.0, false)))
  }

  test("interpolated resample blends gap values by time fraction") {
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 10:30:00"), 3.0),
      // 11:00 and 12:00 missing: expect 3 + (9-3)*1/3 = 5, 3 + (9-3)*2/3 = 7
      (Timestamp.valueOf("2024-01-01 13:30:00"), 9.0)
    ).toDF("ts", "v")
    val out = Resample.resampleInterpolate(df, "ts", "hour", "INTERVAL 1 HOUR",
        Det.dsum(col("v")), "v")
      .as[(Timestamp, Double, Boolean)].collect()
    assert(out.length === 4)
    assert(out(0) === ((Timestamp.valueOf("2024-01-01 10:00:00"), 3.0, false)))
    assert(out(1) === ((Timestamp.valueOf("2024-01-01 11:00:00"), 5.0, true)))
    assert(out(2) === ((Timestamp.valueOf("2024-01-01 12:00:00"), 7.0, true)))
    assert(out(3) === ((Timestamp.valueOf("2024-01-01 13:00:00"), 9.0, false)))
  }

  test("ohlc: open/close pick by (ts, value); high/low over the bucket; ties deterministic") {
    val df = Seq(
      ("s", Timestamp.valueOf("2024-01-01 10:00:00"), 5.0), // open tie ts...
      ("s", Timestamp.valueOf("2024-01-01 10:00:00"), 3.0), // ...smaller value wins open
      ("s", Timestamp.valueOf("2024-01-01 10:20:00"), 9.0), // high
      ("s", Timestamp.valueOf("2024-01-01 10:40:00"), 1.0), // low
      ("s", Timestamp.valueOf("2024-01-01 10:59:00"), 6.0), // close tie ts...
      ("s", Timestamp.valueOf("2024-01-01 10:59:00"), 7.0), // ...larger value wins close
      ("s", Timestamp.valueOf("2024-01-01 11:10:00"), 2.0)  // next bucket
    ).toDF("k", "ts", "v")
    val out = Resample.ohlc(df, "k", "ts", "v", unit = "hour")
      .orderBy("bucket_start")
      .as[(String, Timestamp, Double, Double, Double, Double, Long)].collect()
    assert(out(0) === (("s", Timestamp.valueOf("2024-01-01 10:00:00"),
      3.0, 9.0, 1.0, 7.0, 6L)))
    assert(out(1) === (("s", Timestamp.valueOf("2024-01-01 11:00:00"),
      2.0, 2.0, 2.0, 2.0, 1L)))
  }

  test("gaps: reports only consecutive deltas strictly over the threshold, per key") {
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-01 10:00:00")),
      ("a", Timestamp.valueOf("2024-01-01 11:00:00")),   // exactly 1h — NOT a gap (strict >)
      ("a", Timestamp.valueOf("2024-01-01 13:30:00")),   // 2.5h — gap
      ("b", Timestamp.valueOf("2024-01-01 09:00:00")),
      ("b", Timestamp.valueOf("2024-01-01 09:30:00"))    // 30m — no gap
    ).toDF("k", "ts")
    val out = Resample.gaps(df, "k", "ts", "1 HOUR")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSeq
    assert(out === Seq(("a", Timestamp.valueOf("2024-01-01 11:00:00"),
      Timestamp.valueOf("2024-01-01 13:30:00"), 9000000000L)))
  }
}
