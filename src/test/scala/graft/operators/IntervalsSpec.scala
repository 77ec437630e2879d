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

  test("overlapJoin equals the naive theta join, at several grid widths") {
    // deterministic pseudo-random closed intervals over ~3 days,
    // lengths from minutes to a day — pairs span many grid cells
    val base = 1704067200000000L
    val iv = (0 until 60).map { i =>
      val s = base + (i * 2654435761L % 259200L) * 1000000L
      val len = (1L + i * 40503L % 86400L) * 1000000L
      (i.toLong, new java.sql.Timestamp(s / 1000),
        new java.sql.Timestamp((s + len) / 1000))
    }.toDF("id", "s", "e")
    val naive = iv.as("a").crossJoin(iv.as("b"))
      .filter(col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (gridUs <- Seq(600000000L, 3600000000L, 86400000000L)) {
      val got = Intervals.overlapJoin(iv, iv, "id", "id", "s", "e", gridUs)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size,
        s"grid $gridUs emitted duplicate pairs") // cell-dedup exact
      assert(got.toSet === naive, s"grid $gridUs diverged from naive")
    }
  }

  test("hot-cell guard: degenerate all-overlapping hour — results unchanged, group bounded") {
    // 400 intervals ALL inside the same hour cell: the degenerate skew
    // case where every candidate lands on one join key
    val base = 1704067200000000L
    val iv = (0 until 400).map { i =>
      (i.toLong, new Timestamp((base + i * 1000000L) / 1000),
        new Timestamp((base + 3000000000L + i * 1000000L) / 1000))
    }.toDF("id", "s", "e")
    val gridUs = 3600000000L
    // results must be IDENTICAL with the guard engaged (threshold 50 ≪
    // 400 forces salting) vs effectively off
    val guarded = Intervals.overlapJoin(iv, iv, "id", "id", "s", "e",
        gridUs, hotCellRows = 50L, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val plain = Intervals.overlapJoin(iv, iv, "id", "id", "s", "e",
        gridUs, hotCellRows = Long.MaxValue / 2, salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(guarded.length === guarded.toSet.size, "salting duplicated pairs")
    assert(guarded.toSet === plain.toSet)
    // the bound itself: no (cell, salt) group on the probe (A) side may
    // keep the whole hot cell — salting must divide the equal-key group
    val (ac, bc) = Intervals.saltedGridSides(iv, iv, "id", "id", "s", "e",
      gridUs, hotCellRows = 50L, salts = 8)
    val maxGroup = ac.groupBy("cell", "salt").count()
      .agg(max("count")).as[Long].head()
    assert(maxGroup < 400L / 8L * 3L, s"hot cell not divided: $maxGroup")
    assert(ac.select("salt").distinct().count() === 8L)
    // B side duplicates hot-cell rows across every salt
    val hotCellBRows = bc.groupBy("cell").count().agg(max("count")).as[Long].head()
    assert(hotCellBRows >= 400L * 8L)
  }

  test("hot-cell guard off-path: cold cells keep salt 0 and no B-side blowup") {
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      (2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00"))
    ).toDF("id", "s", "e")
    val (ac, bc) = Intervals.saltedGridSides(iv, iv, "id", "id", "s", "e",
      3600000000L, hotCellRows = 100000L, salts = 16)
    assert(ac.select("salt").distinct().as[Int].collect().toSeq === Seq(0))
    assert(bc.count() === 2L) // one row per (interval, cell), no explode
  }

  test("overlapJoin closed semantics: touching endpoints DO pair; windows exact") {
    val a = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))).toDF("id", "s", "e")
    val b = Seq((2L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-01 11:00:00.000001"), ts("2024-01-01 12:00:00"))).toDF("id", "s", "e")
    val got = Intervals.overlapJoin(a, b, "id", "id", "s", "e", 3600000000L)
      .collect()
    assert(got.length === 1 && got.head.getLong(1) === 2L)
    assert(got.head.getTimestamp(2) === ts("2024-01-01 11:00:00"))
    assert(got.head.getTimestamp(3) === ts("2024-01-01 11:00:00"))
  }
}
