package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val base = Seq(
    ("a", ts("2024-01-01 00:00:00"), 1.0),
    ("b", ts("2024-01-02 00:00:00"), 2.0),
    ("c", ts("2024-01-03 00:00:00"), 3.0))
    .toDF("k", "ts", "v")

  test("upsert replaces, delete removes, untouched keys survive, new keys insert") {
    val changes = Seq(
      ("a", ts("2024-01-10 00:00:00"), 10.0, "U", 1L), // replace a
      ("b", ts("2024-01-10 00:00:00"), 0.0, "D", 2L),  // delete b
      ("d", ts("2024-01-10 00:00:00"), 40.0, "U", 3L)) // insert d
      .toDF("k", "ts", "v", "op", "cid")
    val out = Merge.applyChanges(base, changes, "k", "ts", "op",
      tieBreak = Seq("cid")).orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "c", "d"))
    assert(out(0).getDouble(2) === 10.0) // a replaced
    assert(out(1).getDouble(2) === 3.0)  // c untouched
    assert(out(2).getDouble(2) === 40.0) // d inserted
    // output schema is exactly the snapshot's
    assert(Merge.applyChanges(base, changes, "k", "ts", "op",
      tieBreak = Seq("cid")).columns.toSeq === base.columns.toSeq)
  }

  test("latest change per key wins; earlier same-batch changes are superseded") {
    val changes = Seq(
      ("a", ts("2024-01-10 00:00:00"), 99.0, "U", 1L),
      ("a", ts("2024-01-11 00:00:00"), 0.0, "D", 2L),  // latest: delete
      ("b", ts("2024-01-10 00:00:00"), 0.0, "D", 3L),
      ("b", ts("2024-01-11 00:00:00"), 22.0, "U", 4L)) // latest: upsert
      .toDF("k", "ts", "v", "op", "cid")
    val out = Merge.applyChanges(base, changes, "k", "ts", "op",
      tieBreak = Seq("cid")).orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("b", "c"))
    assert(out(0).getDouble(2) === 22.0)
  }

  test("equal change times resolve by the tie-break, deterministically") {
    val t0 = ts("2024-01-10 00:00:00")
    val changes = Seq(
      ("a", t0, 1.0, "U", 1L),
      ("a", t0, 2.0, "U", 2L)) // higher cid wins (desc order)
      .toDF("k", "ts", "v", "op", "cid")
    val out = Merge.applyChanges(base, changes, "k", "ts", "op",
      tieBreak = Seq("cid")).filter($"k" === "a").collect()
    assert(out.head.getDouble(2) === 2.0)
  }

  test("deleting an absent key is a no-op; empty changes return the base") {
    val del = Seq(("zz", ts("2024-01-10 00:00:00"), 0.0, "D", 1L))
      .toDF("k", "ts", "v", "op", "cid")
    assert(Merge.applyChanges(base, del, "k", "ts", "op",
      tieBreak = Seq("cid")).count() === 3)
    val none = del.filter(lit(false))
    assert(Merge.applyChanges(base, none, "k", "ts", "op",
      tieBreak = Seq("cid")).orderBy("k").collect()
      === base.orderBy("k").collect())
  }

  test("a winning change with NULL op is applied as an upsert, never a drop or a ghost") {
    // op nullness must not be conflated with key-absent-from-batch:
    // a null-op change replaces an existing key's payload and inserts
    // a new key with ITS payload (not an all-null row).
    val changes = Seq(
      ("a", ts("2024-01-10 00:00:00"), 11.0, null.asInstanceOf[String], 1L),
      ("e", ts("2024-01-10 00:00:00"), 50.0, null.asInstanceOf[String], 2L))
      .toDF("k", "ts", "v", "op", "cid")
    val out = Merge.applyChanges(base, changes, "k", "ts", "op",
      tieBreak = Seq("cid")).orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b", "c", "e"))
    assert(out(0).getDouble(2) === 11.0)  // a replaced, not silently kept
    assert(!out(3).isNullAt(2) && out(3).getDouble(2) === 50.0) // e real, not all-null
  }

  test("changes missing a snapshot column fail loudly") {
    val bad = Seq(("a", ts("2024-01-10 00:00:00"), "U"))
      .toDF("k", "ts", "op") // no v
    val e = intercept[IllegalArgumentException] {
      Merge.applyChanges(base, bad, "k", "ts", "op")
    }
    assert(e.getMessage.contains("missing snapshot columns"))
  }
}
