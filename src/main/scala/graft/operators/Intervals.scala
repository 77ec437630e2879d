package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep analytics over CLOSED intervals `[start, end]` —
  * the gaps-and-islands complement to [[Sessionize]] (which builds the
  * intervals; this consumes them).
  *
  * The textbook sweep (+1 at start, -1 at end, running sum, max) needs
  * a TOTAL order over all boundaries — a single-partition window, the
  * one shape that cannot scale. The scalable formulation here clips
  * every interval at calendar-day boundaries first, so the sweep
  * partitions BY DAY and each day's running sum is independent: an
  * interval spanning midnight contributes a segment ending at
  * 23:59:59.999999 and a fresh segment opening at 00:00:00 the next
  * day, which leaves every day's concurrency count exact. Cost at
  * scale: one explode bounded by days-spanned (sessions span 1-2
  * days), one hash exchange on the day, per-day sorts that AQE sizes
  * independently. Skew = a hot day; the partition key can be refined
  * to (day, hour) by the same clipping argument if a day outgrows an
  * executor.
  */
object Intervals {

  /** Maximum number of concurrently-open intervals per calendar day.
    *
    * Closed-interval semantics: an interval ending at instant t and
    * another starting at t DO overlap (both counted at t) — the sweep
    * orders `+1` boundaries before `-1` at equal timestamps
    * (`delta DESC`). Within an equal (ts, delta) block the running sum
    * is monotone, so the per-day MAX is deterministic without any
    * further tie-break. Zero-length clipped segments (an interval
    * ending exactly at midnight) still contribute their +1/-1 pair at
    * one instant and count correctly. */
  def maxConcurrencyByDay(
      df: DataFrame, startCol: String, endCol: String): DataFrame = {
    val seg = df
      .select(col(startCol).as("s"), col(endCol).as("e"))
      .select(explode(sequence(
          date_trunc("day", col("s")), date_trunc("day", col("e")),
          expr("interval 1 day"))).as("day"),
        col("s"), col("e"))
      .select(col("day"),
        greatest(col("s"), col("day")).as("seg_start"),
        least(col("e"),
          col("day") + expr("interval 1 day") - expr("interval 1 microsecond"))
          .as("seg_end"))
    // one explode, not a UNION of two projections — a union would make
    // Spark recompute the whole upstream lineage (e.g. q50's session
    // build) once per branch
    val bounds = seg
      .select(col("day"), explode(array(
        struct(col("seg_start").as("ts"), lit(1).as("delta")),
        struct(col("seg_end").as("ts"), lit(-1).as("delta")))).as("b"))
      .select(col("day"), col("b.ts").as("ts"), col("b.delta").as("delta"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("ts").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .withColumn("running", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("running")).as("max_concurrent"))
      .select(to_date(col("day")).as("day"), col("max_concurrent"))
  }

  /** Overlap join of two CLOSED-interval sets: every (a, b) pair with
    * `a.start <= b.end AND b.start <= a.end`, with the overlap window.
    *
    * The naive formulation is a theta-join — a cartesian product that
    * Spark can only nested-loop. The scalable shape here is the
    * standard spatial-grid join in one dimension: each interval
    * explodes onto the `gridUs`-wide time cells it touches, candidates
    * equi-join ON THE CELL (a plain hash-partitioned join), and the
    * exact overlap predicate filters candidates. A pair co-occurring in
    * several cells is credited ONLY in the first cell both touch
    * (`cell == max(firstCell_a, firstCell_b)` — that cell is always
    * touched by both: the later start lies before the earlier end
    * whenever the intervals overlap), so no distinct/dedup pass is
    * needed. Cost at scale: explode factor = interval span / gridUs
    * (pick the grid near the typical interval length to keep it O(1)),
    * one cell-keyed shuffle each side.
    *
    * Hot-cell guard: a single cell holding a large slice of both sides
    * (a busy hour) is the one skew this join can hit — all its
    * candidates land in ONE task's equal-key group, and neither AQE
    * partition-splitting nor more shuffle partitions divides an equal
    * KEY. Cells whose A-side candidate count exceeds `hotCellRows` are
    * S-way salted: A rows take salt = hash(id) mod `salts`, B rows
    * duplicate across all salts, and the join keys on (cell, salt) —
    * each (a, b) candidate pair still meets exactly once (at a's
    * salt), results are IDENTICAL, but the per-task group shrinks
    * `salts`-fold. Cost when no cell is hot: one map-side-combined
    * per-cell count plus two broadcast probes against an (empty)
    * hot-cell list — no extra exchange on the data path. */
  def overlapJoin(
      a: DataFrame, b: DataFrame,
      idColA: String, idColB: String,
      startCol: String, endCol: String, gridUs: Long,
      hotCellRows: Long = 100000L, salts: Int = 16): DataFrame = {
    val (ac, bc) = saltedGridSides(a, b, idColA, idColB,
      startCol, endCol, gridUs, hotCellRows, salts)
    ac.join(bc, Seq("cell", "salt"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .filter(col("cell") ===
        greatest(expr(s"a_s div $gridUs"), expr(s"b_s div $gridUs")))
      .select(col("a_id"), col("b_id"),
        timestamp_micros(greatest(col("a_s"), col("b_s"))).as("overlap_start"),
        timestamp_micros(least(col("a_e"), col("b_e"))).as("overlap_end"))
  }

  /** The two salted candidate sides of [[overlapJoin]], exposed so the
    * skew property test can assert the per-(cell, salt) group bound
    * directly on the frames the join consumes. */
  private[graft] def saltedGridSides(
      a: DataFrame, b: DataFrame,
      idColA: String, idColB: String,
      startCol: String, endCol: String, gridUs: Long,
      hotCellRows: Long, salts: Int): (DataFrame, DataFrame) = {
    require(gridUs > 0, s"gridUs must be positive, got $gridUs")
    require(hotCellRows > 0 && salts >= 2,
      s"bad hot-cell guard: hotCellRows=$hotCellRows salts=$salts")
    def cells(df: DataFrame, id: String, tag: String): DataFrame = df
      .select(col(id).as(s"${tag}_id"),
        unix_micros(col(startCol)).as(s"${tag}_s"),
        unix_micros(col(endCol)).as(s"${tag}_e"))
      .withColumn("cell", explode(sequence(
        expr(s"${tag}_s div $gridUs"), expr(s"${tag}_e div $gridUs"))))
    val ac = cells(a, idColA, "a")
    val bc = cells(b, idColB, "b")
    val hot = broadcast(ac.groupBy(col("cell"))
      .agg(count(lit(1)).as("n")).filter(col("n") > hotCellRows)
      .select(col("cell"), lit(1).as("__hot")))
    val aSalted = ac.join(hot, Seq("cell"), "left_outer")
      .withColumn("salt", when(col("__hot").isNotNull,
        pmod(xxhash64(col("a_id")), lit(salts)).cast("int")).otherwise(lit(0)))
      .drop("__hot")
    val bSalted = bc.join(hot, Seq("cell"), "left_outer")
      .withColumn("salt", explode(when(col("__hot").isNotNull,
        sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0)))))
      .drop("__hot")
    (aSalted, bSalted)
  }
}
