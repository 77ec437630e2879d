package graft.operators

import graft.SparkSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: two events 10 min apart, then a 40-min gap -> 2 sessions
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 10:10:00"), 101L),
    (1L, ts("2024-01-01 10:50:00"), 102L),
    // user 2: single event -> its own session
    (2L, ts("2024-01-01 09:00:00"), 200L),
    // user 1: exactly-at-gap boundary (30 min AFTER 10:50) is NOT a new
    // session (gap test is strict >)
    (1L, ts("2024-01-01 11:20:00"), 103L)
  ).toDF("user_id", "ts", "event_id")

  private val gap30mUs = 30L * 60 * 1000000

  test("assignSessions numbers gap-separated runs per key") {
    val got = Sessionize.assignSessions(
        events, "user_id", "ts", gap30mUs, tieBreak = Seq("event_id"))
      .select($"event_id", $"session_no").as[(Long, Long)].collect().toMap
    assert(got === Map(100L -> 1L, 101L -> 1L, 102L -> 2L,
      103L -> 2L, 200L -> 1L))
  }

  test("sessionize rolls up start/end/count per session") {
    val got = Sessionize.sessionize(
        events, "user_id", "ts", gap30mUs, tieBreak = Seq("event_id"))
      .select($"user_id", $"session_no", $"session_start", $"session_end",
        $"n_events")
      .as[(Long, Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L),
      (1L, 2L, ts("2024-01-01 10:50:00"), ts("2024-01-01 11:20:00"), 2L),
      (2L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 1L)))
  }

  test("degenerate gaps: huge gap -> one session; 1µs gap -> one each") {
    val one = Sessionize.sessionize(events, "user_id", "ts",
      gapUs = 365L * 86400 * 1000000, tieBreak = Seq("event_id"))
    assert(one.filter($"user_id" === 1L).count() === 1)
    val each = Sessionize.sessionize(events, "user_id", "ts",
      gapUs = 1L, tieBreak = Seq("event_id"))
    assert(each.filter($"user_id" === 1L).count() === 4)
  }

  test("plan shape: the lag flag and running sum share one exchange") {
    // string check on the pre-execution plan (the PlanGuardSpec idiom —
    // after execution AQE wraps the exchange in a ShuffleQueryStage and
    // prints initial+final plans, double-counting)
    val p = Sessionize.assignSessions(
        events, "user_id", "ts", gap30mUs, tieBreak = Seq("event_id"))
      .queryExecution.executedPlan.toString
    // one hash exchange on user_id — the minimum for per-key ordered
    // work; a second one would mean the two window specs diverged
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert("Window".r.findAllIn(p).size >= 2, p)
  }
}
