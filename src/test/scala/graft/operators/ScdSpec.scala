package graft.operators

import graft.SparkSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val changes = Seq(
    // user 1: A A B A -> three runs (the repeated A at 10:10 collapses)
    (1L, ts("2024-01-01 10:00:00"), 100L, Some("A")),
    (1L, ts("2024-01-01 10:10:00"), 101L, Some("A")),
    (1L, ts("2024-01-01 10:20:00"), 102L, Some("B")),
    (1L, ts("2024-01-01 10:30:00"), 103L, Some("A")),
    // user 2: NULL NULL X -> the NULL run collapses (null-safe compare)
    (2L, ts("2024-01-01 09:00:00"), 200L, None),
    (2L, ts("2024-01-01 09:05:00"), 201L, None),
    (2L, ts("2024-01-01 09:10:00"), 202L, Some("X"))
  ).toDF("user_id", "ts", "event_id", "state")

  private def history = Scd.scd2(
    changes, "user_id", "ts", "state", tieBreak = Seq("event_id"))

  test("collapses runs and chains validity intervals") {
    val got = history
      .select($"user_id", $"state", $"valid_from", $"valid_to")
      .as[(Long, Option[String], Timestamp, Option[Timestamp])]
      .collect().toSet
    assert(got === Set(
      (1L, Some("A"), ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:20:00"))),
      (1L, Some("B"), ts("2024-01-01 10:20:00"), Some(ts("2024-01-01 10:30:00"))),
      (1L, Some("A"), ts("2024-01-01 10:30:00"), None),
      (2L, None, ts("2024-01-01 09:00:00"), Some(ts("2024-01-01 09:10:00"))),
      (2L, Some("X"), ts("2024-01-01 09:10:00"), None)))
  }

  test("intervals partition each key's timeline: no gaps, no overlaps") {
    // every valid_to equals the key's next valid_from; exactly one open row
    val h = history.collect()
    changes.select($"user_id").distinct().as[Long].collect().foreach { u =>
      val rows = h.filter(_.getLong(0) == u)
        .sortBy(_.getTimestamp(2).getTime)
      assert(rows.count(_.isNullAt(3)) === 1)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getTimestamp(3) === b.getTimestamp(2))
        case _ =>
      }
    }
  }

  test("single-row key yields one open interval") {
    val got = Scd.scd2(
        Seq((9L, ts("2024-01-01 00:00:00"), 1L, "Z"))
          .toDF("user_id", "ts", "event_id", "state"),
        "user_id", "ts", "state", tieBreak = Seq("event_id"))
      .as[(Long, String, Timestamp, Option[Timestamp])].collect().toSeq
    assert(got === Seq((9L, "Z", ts("2024-01-01 00:00:00"), None)))
  }

  test("plan shape: both windows and the run filter share one exchange") {
    val p = history.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r
      .findAllIn(p).size === 1, p)
  }
}
