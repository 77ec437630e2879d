package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse a per-key
  * change-event stream into validity intervals `[valid_from, valid_to)`
  * — one row per maximal run of an unchanged state, `valid_to` NULL on
  * the current (open) row. The reference stores raw timestamped rows
  * (ChronoBase table.go row model); this derives the warehouse-style
  * dimension history VIEW of that stream, the standard
  * point-in-time-join companion (the as-of join q08/q09 consumes
  * exactly such intervals).
  *
  * Distributed shape (same discipline as [[Sessionize]]): a lag()
  * change-flag and a lead() interval close are window expressions over
  * the SAME (key; time, tieBreak) spec, so the whole build costs ONE
  * hash exchange on the key plus one sort — no self-join. Run-collapse
  * happens BEFORE the lead(), so the second window runs over the
  * (smaller) changed-rows frame; per-key window state is O(1)
  * (lag/lead buffer one row).
  */
object Scd {

  /** `df` → (key, state, valid_from, valid_to) SCD2 history.
    *
    * Consecutive rows with an equal state value are collapsed into the
    * first row's interval; a NULL state is a real state (runs of NULL
    * collapse too — the null-safe `<=>` comparison, which an
    * oracle must mirror with IS NOT DISTINCT FROM).
    *
    * `tieBreak` disambiguates equal timestamps deterministically —
    * required for a stable history when (key, time) is not unique. */
  def scd2(
      df: DataFrame, keyCol: String, timeCol: String, stateCol: String,
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val order: Seq[Column] = col(timeCol) +: tieBreak.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val changed = df
      .withColumn("__prev_state", lag(col(stateCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      // keep the first row of every run: history starts, or state differs
      // from the previous row (null-safe on both sides)
      .filter(col("__first") || !(col(stateCol) <=> col("__prev_state")))
    changed
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .select(col(keyCol), col(stateCol).as("state"),
        col(timeCol).as("valid_from"), col("valid_to"))
  }
}
