package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE-style change application: fold a keyed change batch into a
  * keyed snapshot — the `MERGE INTO` / CDC-apply primitive every
  * warehouse table maintenance job runs. The reference is insert-only
  * (SURVEY.md §1.2 — no update or delete-by-key anywhere); this is the
  * standard extension a user reaches for the moment a table holds
  * current-state rows rather than an immutable event log.
  *
  * Semantics (deduplicated-source MERGE):
  *  - per key, the LATEST change (by change time, then `tieBreak`) wins
  *    — earlier changes in the same batch are superseded, so applying a
  *    batch is idempotent and order-insensitive in its input row order;
  *  - a winning change with op = `deleteOp` removes the key (deleting an
  *    absent key is a no-op);
  *  - any other winning change replaces the key's payload wholesale, or
  *    inserts it if the key is new;
  *  - keys without changes keep their base row untouched.
  *
  * Scale shape: one window shuffle of the CHANGE batch on the key (the
  * small side in steady state — a CDC batch is a sliver of the
  * snapshot), then one full-outer join on the key. Both stages key
  * their exchanges on the bare join column, so a bucketed/partitioned
  * snapshot co-locates and the snapshot side never re-shuffles; when
  * the deduplicated change batch fits the broadcast threshold, AQE
  * turns the join map-side. Per-key state in the window is a single
  * row_number counter — skewed keys stream through.
  */
object Merge {

  /** Applies `changes` to `base` and returns the new snapshot, with
    * exactly `base`'s columns. `changes` must carry `base`'s columns
    * plus `opCol` (extra columns — e.g. a tie-break id — are allowed
    * and ignored in the output).
    *
    * Determinism precondition: (tsCol, tieBreak*) must totally order
    * each key's changes — with ties left unbroken, "latest" is
    * whichever tied row the window sort happened to place first, and
    * two runs can produce different snapshots. Pass a unique change id
    * in `tieBreak` when change times can collide.
    *
    * Change-presence is tracked by a dedicated marker column, NOT by
    * `opCol` nullness — a change row whose op value is NULL is a
    * malformed change, and conflating it with "key absent from the
    * batch" would silently ignore it for existing keys and emit an
    * all-null payload row for new keys. A null-op winning change is
    * applied as an upsert (it is not the delete op). */
  def applyChanges(
      base: DataFrame, changes: DataFrame,
      keyCol: String, tsCol: String, opCol: String,
      deleteOp: String = "D", tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val missing = (payload :+ keyCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing snapshot columns: ${missing.mkString(", ")}")
    val order: Seq[Column] =
      col(tsCol).desc +: tieBreak.map(col(_).desc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol) +: col(opCol) +: lit(1).as("__hit") +:
        payload.map(c => col(c).as(s"__ch_$c")): _*)
    base.join(latest, Seq(keyCol), "full_outer")
      // keep unless a change is PRESENT and its op is the delete op;
      // <=> so a null op compares false (upsert), not null (drop)
      .filter(!(col("__hit").isNotNull && (col(opCol) <=> deleteOp)))
      .select(col(keyCol) +: payload.map(c =>
        when(col("__hit").isNotNull, col(s"__ch_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
