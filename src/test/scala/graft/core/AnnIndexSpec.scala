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
      // same serve contract as annTopK (r19 #1): an INSERT serves live
      // — the new row joins the pairing under its on-the-fly stored-
      // centroid assignment; a row REWRITE still refuses
      db.insertFrame("e", spark.range(1).selectExpr(
        "8000L as vec_id", "timestamp'2024-01-01 11:00:00' as ts",
        "transform(sequence(0,7), j -> cast(0.25 as float)) as embedding"))
      val keptLive = db.semanticDedupStored("e", threshold = 0.8)
      assert(keptLive.count() === n + 1,
        "the fresh far-from-everything insert must survive, live")
      assert(keptLive.filter(col("vec_id") === 8000L).count() === 1L)
      db.deleteWhere("e", col("vec_id") === 8000L)
      intercept[IllegalStateException](db.semanticDedupStored("e", 0.8))
    } finally db.close()
  }

  test("delta serve (r19 #1): inserts answer live, exactly, priced at the delta; compact folding the delta refuses") {
    val dir = Files.createTempDirectory("ann4").toString
    val db = freshDb(dir)
    try {
      db.createTable("e", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("ts", TimestampType),
        StructField("embedding", ArrayType(FloatType)))))
      def rows(lo: Long, hi: Long, day: String) = spark.range(lo, hi)
        .selectExpr("id as vec_id", s"timestamp'$day 10:00:00' as ts",
          """transform(sequence(0, 7), j -> cast(
             |  (case when j = cast(id % 2 as int) then 1.0 else 0.0 end)
             |  + sin(id * 7 + j) * 0.1 as float)) as embedding""".stripMargin)
      db.insertFrame("e", rows(0, 150, "2024-01-01"))
      db.buildAnnIndex("e", "vec_id", "embedding", nlist = 8, seed = 7L)
      // post-build ingest into a DIFFERENT bucket, two batches — the
      // fragmented delta bucket gives the compact below a victim
      db.insertFrame("e", rows(150, 180, "2024-01-02"))
      db.insertFrame("e", rows(180, 200, "2024-01-02"))
      assert(!db.annIndexFresh("e"))
      assert(db.annServeState("e").isInstanceOf[AnnServeState.InsertDelta])
      // exhaustive probes ⇒ delta serve ≡ brute force over the FULL
      // live table (indexed rows from cells, new rows from the scan)
      val q = db.table("e").filter(col("vec_id") < 4)
      val served = db.annTopK("e", q, k = 5, nprobe = 8)
      val brute = graft.operators.Similarity.bruteForceTopK(
        db.table("e"), q, "vec_id", "embedding", 5)
      assert(served.select("query_id", "rank", "neighbor_id")
        .except(brute.select("query_id", "rank", "neighbor_id"))
        .count() === 0L)
      assert(served.count() === 20L)
      // a post-build neighbor must be REACHABLE (vec 151 pairs blob 1)
      assert(db.annTopK("e",
          db.table("e").filter(col("vec_id") === 151L), k = 200, nprobe = 8)
        .filter(col("neighbor_id") >= 150L).count() > 0L)
      // pricing: the non-index data I/O is exactly the DELTA files —
      // the 2024-01-01 bucket's (indexed) files never rescan
      val one = db.annTopK("e", db.table("e").filter(col("vec_id") === 0L),
        k = 3, nprobe = 2)
      one.collect()
      val plan = one.queryExecution.executedPlan
      val total = PlanMetrics.scannedFilesUnder(plan, "/e")
      val cells = PlanMetrics.scannedFilesUnder(plan, "_ann_cells")
      val deltaFiles = db.annServeState("e") match {
        case AnnServeState.InsertDelta(d) => d.size.toLong
        case s => fail(s"expected InsertDelta, got $s")
      }
      assert(total - cells <= deltaFiles,
        s"delta serve scanned ${total - cells} data files, delta is $deltaFiles")
      // compact folds the delta files into rewrites → no longer separable
      assert(db.compact("e") >= 1)
      val st = db.annServeState("e")
      assert(st.isInstanceOf[AnnServeState.Unservable], s"got $st")
      intercept[IllegalStateException](db.annTopK("e", q, 3, 2))
    } finally db.close()
  }

  test("delta append: buildAnnIndexIfStale folds inserts in O(delta), keeps integrity exact, sweeps crash orphans") {
    val dir = Files.createTempDirectory("ann5").toString
    val db = freshDb(dir)
    try {
      seedTable(db, "e") // 200 rows, day bucket 2024-01-01
      db.buildAnnIndex("e", "vec_id", "embedding", nlist = 8, seed = 7L)
      db.insertFrame("e", spark.range(200, 260).selectExpr(
        "id as vec_id", "timestamp'2024-01-02 10:00:00' as ts",
        """transform(sequence(0, 7), j -> cast(
           |  (case when j = cast(id % 2 as int) then 1.0 else 0.0 end)
           |  + sin(id * 7 + j) * 0.1 as float)) as embedding""".stripMargin))
      assert(db.annServeState("e").isInstanceOf[AnnServeState.InsertDelta])
      assert(db.buildAnnIndexIfStale("e"), "insert staleness must repair")
      assert(db.annIndexFresh("e"), "delta append must restore Fresh")
      // the append went through the TAGGED file path, not a rebuild
      val cellsDir = new java.io.File(s"$dir/e/_ann_cells")
      val deltaTagged = cellsDir.listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).map(_.getName)
        .filter(_.startsWith("delta-v"))
      assert(deltaTagged.nonEmpty, "expected delta-v tagged appended files")
      // integrity contract intact: stored lists ≡ re-derivation from
      // `_ann` alone, for ALL 260 rows (the d45 verdict, post-append)
      assert(db.annStoredAssignments("e")
        .join(db.annAssignFromStored("e"), Seq("id", "cell"), "left_anti")
        .count() === 0L)
      assert(db.annAssignFromStored("e")
        .join(db.annStoredAssignments("e"), Seq("id", "cell"), "left_anti")
        .count() === 0L)
      // `_ann` n counts track the append
      assert(db.annStoredAssignments("e").count() === 260L)
      // serve from the appended index ≡ brute force (exhaustive probes)
      val q = db.table("e").filter(col("vec_id").isin(0L, 255L))
      assert(db.annTopK("e", q, k = 5, nprobe = 8)
        .select("query_id", "rank", "neighbor_id")
        .except(graft.operators.Similarity.bruteForceTopK(
          db.table("e"), q, "vec_id", "embedding", 5)
          .select("query_id", "rank", "neighbor_id"))
        .count() === 0L)

      // CRASH-ORPHAN path: fake a crashed append — copy one live row's
      // assignment into its cell under an UNADOPTED (higher) tag. The
      // orphan's row now sits in the cells AND (after a fresh insert)
      // in the delta; the serve union must dedupe it, and the next
      // append must sweep it before landing files.
      db.insertFrame("e", spark.range(260, 261).selectExpr(
        "id as vec_id", "timestamp'2024-01-03 10:00:00' as ts",
        """transform(sequence(0, 7), j -> cast(
           |  (case when j = cast(id % 2 as int) then 1.0 else 0.0 end)
           |  + sin(id * 7 + j) * 0.1 as float)) as embedding""".stripMargin))
      val cell260 = db.annAssignFromStored("e")
        .filter(col("id") === 260L).head().getInt(1)
      val tmp = s"$dir/fake_orphan"
      db.table("e").filter(col("vec_id") === 260L)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val orphan = new java.io.File(
        s"$dir/e/_ann_cells/cell=$cell260/delta-v999-fake.parquet")
      java.nio.file.Files.copy(part.toPath, orphan.toPath)
      // delta serve: vec 260 answers ONCE per query despite living on
      // both sides of the union
      val dup = db.annTopK("e",
          db.table("e").filter(col("vec_id") === 0L), k = 300, nprobe = 8)
        .groupBy(col("neighbor_id")).count().filter(col("count") > 1L)
      assert(dup.count() === 0L, "crash-orphan rows must dedupe in the serve")
      // append again: the sweep removes the unadopted tag first
      assert(db.buildAnnIndexIfStale("e"))
      assert(!orphan.exists, "unadopted orphan must be swept by the append")
      assert(db.annIndexFresh("e"))
      assert(db.annStoredAssignments("e").count() === 261L)
      assert(db.annStoredAssignments("e")
        .join(db.annAssignFromStored("e"), Seq("id", "cell"), "left_anti")
        .count() === 0L)
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
      // the probe guard: a corpus-scale query frame refuses loudly
      // instead of silently collecting onto the driver (the serving
      // contract is a bounded batch per call)
      val g = intercept[IllegalArgumentException](
        db.annTopK("e", db.table("e"), k = 3, nprobe = 4, maxProbes = 8))
      assert(g.getMessage.contains("bounded batch"))
      assert(db.annTopK("e", db.table("e").filter(col("vec_id") < 2),
        k = 3, nprobe = 4, maxProbes = 8).count() === 6)
    } finally db.close()
  }
}
