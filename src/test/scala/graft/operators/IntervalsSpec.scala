package graft.operators

import graft.SparkSuite
import java.sql.Timestamp
import java.sql.Date
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def d(s: String): Date = Date.valueOf(s)

  test("counts closed-interval overlap, including touch-at-an-instant") {
    //  a: [10:00, 11:00]   b: [10:30, 12:00]   c: [11:00, 11:30]
    // at 11:00 a ends, c starts, b is open -> all three concurrent
    val iv = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00")),
      (ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00"))
    ).toDF("s", "e")
    val got = Intervals.maxConcurrencyByDay(iv, "s", "e")
      .as[(Date, Long)].collect().toMap
    assert(got === Map(d("2024-01-01") -> 3L))
  }

  test("midnight-spanning interval counts on both days") {
    val iv = Seq(
      (ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")),
      (ts("2024-01-02 00:30:00"), ts("2024-01-02 00:45:00"))
    ).toDF("s", "e")
    val got = Intervals.maxConcurrencyByDay(iv, "s", "e")
      .as[(Date, Long)].collect().toMap
    assert(got === Map(d("2024-01-01") -> 1L, d("2024-01-02") -> 2L))
  }

  test("interval ending exactly at midnight contributes to the new day") {
    val iv = Seq(
      (ts("2024-01-01 23:00:00"), ts("2024-01-02 00:00:00")),
      (ts("2024-01-02 00:00:00"), ts("2024-01-02 00:10:00"))
    ).toDF("s", "e")
    val got = Intervals.maxConcurrencyByDay(iv, "s", "e")
      .as[(Date, Long)].collect().toMap
    // at instant 00:00 the zero-length clip of the first interval and
    // the second interval's start coincide -> concurrency 2
    assert(got === Map(d("2024-01-01") -> 1L, d("2024-01-02") -> 2L))
  }

  test("disjoint intervals never exceed concurrency 1") {
    val iv = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00")),
      (ts("2024-01-01 10:06:00"), ts("2024-01-01 10:07:00")),
      (ts("2024-01-01 10:08:00"), ts("2024-01-01 10:09:00"))
    ).toDF("s", "e")
    val got = Intervals.maxConcurrencyByDay(iv, "s", "e")
      .as[(Date, Long)].collect().toMap
    assert(got === Map(d("2024-01-01") -> 1L))
  }

  test("plan shape: one scan of the input, no union re-computation") {
    val iv = Seq(
      (ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("s", "e")
    val p = Intervals.maxConcurrencyByDay(iv, "s", "e")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Union"), p)
  }
}
