package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The 100 TB co-location story: bucketed tables joined on the bucket
  * key must plan WITHOUT a shuffle on either side (storage-partitioned
  * sort-merge join). This is the layout ChronoDB-scale deployments use
  * for fact-fact joins instead of paying an exchange per query. */
class BucketingSpec extends SparkSuite with AdaptiveSparkPlanHelper {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    // default warehouse dir (static conf); ensure clean table slots —
    // drop catalog entries AND any stale managed-table directories left
    // by interrupted runs
    Seq("li_b", "ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(java.nio.file.Files.delete(_))
      }
    }

    graft.core.Tables.t(spark, sf(), "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.core.Tables.t(spark, sf(), "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))

    joined.collect() // force final adaptive plan
    val plan = joined.queryExecution.executedPlan
    val preAggShuffles = collectWithSubqueries(plan) {
      case s: ShuffleExchangeLike => s
    }
    // exactly one shuffle: the tiny post-join groupBy; the join itself
    // must be shuffle-free thanks to bucket co-location
    assert(preAggShuffles.size <= 1,
      s"expected <=1 exchange (agg only), got ${preAggShuffles.size}:\n$plan")

    val direct = graft.core.Tables.t(spark, sf(), "lineitem")
      .join(graft.core.Tables.t(spark, sf(), "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("q"))
    assert(joined.orderBy("o_orderpriority").collect() ===
      direct.orderBy("o_orderpriority").collect())
  }

  test("ChronoDB keyBuckets option materializes a co-located key-join layout") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("bdb").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 4))
    try {
      def rows(off: Int) = (0 until 40).map(i => ChronoRow(s"k${i % 10}",
        Timestamp.valueOf(f"2024-01-${1 + i % 5 + off}%02d 10:00:00"),
        Array[Byte](i.toByte)))
      db.createTable("x"); db.insertSeq("x", rows(0))
      db.createTable("y"); db.insertSeq("y", rows(5))
      db.rebuildBucketed("x"); db.rebuildBucketed("y")
      val j = db.bucketedTable("x").select(col("key"))
        .hint("merge")
        .join(db.bucketedTable("y").select(col("key"), col("ts")).hint("merge"),
          Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      j.collect()
      val shuffles = collectWithSubqueries(j.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty,
        s"key join + key agg over the bucketed layout must plan zero " +
          s"exchanges, got ${shuffles.size}:\n${j.queryExecution.executedPlan}")
      // values: 40 rows per table over 10 keys → 4 per key per side →
      // 16 join pairs per key
      val out = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size === 10 && out.values.forall(_ === 16L))
      // the twin's files live under the table's sidecar dir and the
      // catalog entry dies with the table
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "x", "_bucketed")))
      assert(db.table("x").count() === 40,
        "the _bucketed sidecar must stay invisible to normal scans")
      db.dropTable("x")
      assert(!spark.catalog.tableExists(
        s"chrono_x_bucketed_${math.abs(root.hashCode) % 100000}"))
    } finally db.close()
  }

  test("auto-routing: plain table() key join plans zero exchanges without naming the twin") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine}
    import java.sql.Timestamp
    Engine.installOptimizations(spark)
    val root = java.nio.file.Files.createTempDirectory("bauto").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 4))
    try {
      def rows(off: Int) = (0 until 40).map(i => ChronoRow(s"k${i % 10}",
        Timestamp.valueOf(f"2024-01-${1 + i % 5 + off}%02d 10:00:00"),
        Array[Byte](i.toByte)))
      db.createTable("x"); db.insertSeq("x", rows(0))
      db.createTable("y"); db.insertSeq("y", rows(5))
      db.rebuildBucketed("x"); db.rebuildBucketed("y")
      // the caller never names the twin — table() only
      val j = db.table("x").select(col("key")).hint("merge")
        .join(db.table("y").select(col("key"), col("ts")).hint("merge"),
          Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      j.collect()
      val shuffles = collectWithSubqueries(j.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty,
        s"auto-routed key join + agg must plan zero exchanges, got " +
          s"${shuffles.size}:\n${j.queryExecution.executedPlan}")
      val out = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size === 10 && out.values.forall(_ === 16L))
    } finally db.close()
  }

  test("auto-routing: reaches plain SQL over chrono_ views and format(chrono) scans") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine}
    import java.sql.Timestamp
    Engine.installOptimizations(spark)
    val root = java.nio.file.Files.createTempDirectory("bsql").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 4))
    try {
      def rows(off: Int) = (0 until 40).map(i => ChronoRow(s"k${i % 10}",
        Timestamp.valueOf(f"2024-01-${1 + i % 5 + off}%02d 10:00:00"),
        Array[Byte](i.toByte)))
      db.createTable("v"); db.insertSeq("v", rows(0))
      db.rebuildBucketed("v")
      Engine.registerChronoViews(db)
      // a SQL-only user's key aggregation over the view routes too —
      // the view's plan bottoms out in the same registered relation
      val q = spark.sql(
        """SELECT /*+ MERGE(a), MERGE(b) */ a.key, count(*) AS n
          |FROM chrono_v a JOIN chrono_v b ON a.key = b.key
          |GROUP BY a.key""".stripMargin)
      q.collect()
      val shuffles = collectWithSubqueries(q.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty,
        s"SQL view join should auto-route:\n${q.queryExecution.executedPlan}")
      assert(q.collect().map(r => r.getLong(1)).forall(_ === 16L))
      // and a format("chrono") scan of the same directory: the registry
      // key is the table root, which the connector's relation shares
      val src = spark.read.format("chrono").load(s"$root/v")
        .select(col("key"))
      val j2 = src.hint("merge")
        .join(spark.read.format("chrono").load(s"$root/v")
          .select(col("key"), col("ts")).hint("merge"), Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      j2.collect()
      val shuffles2 = collectWithSubqueries(j2.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles2.isEmpty,
        s"format(chrono) scan should auto-route:\n${j2.queryExecution.executedPlan}")
    } finally db.close()
  }

  test("auto-routing: stale twin falls back to the plain scan, refresh restores routing") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine}
    import java.sql.Timestamp
    Engine.installOptimizations(spark)
    val root = java.nio.file.Files.createTempDirectory("bstale").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 4))
    try {
      def rows(off: Int, tag: Int) = (0 until 40).map(i =>
        ChronoRow(s"k${i % 10}",
          Timestamp.valueOf(f"2024-01-${1 + i % 5 + off}%02d 1$tag:00:00"),
          Array[Byte](i.toByte)))
      db.createTable("w"); db.insertSeq("w", rows(0, 0))
      db.rebuildBucketed("w")
      // mutate AFTER the rebuild: twin is stale — the join must answer
      // from the PLAIN table (new rows visible) and must NOT route
      db.insertSeq("w", rows(0, 1))
      def agg() = db.table("w").select(col("key")).hint("merge")
        .join(db.table("w").select(col("key"), col("ts")).hint("merge"),
          Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      val stale = agg()
      val out = stale.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // 8 rows per key per side now → 64 pairs: the stale twin (4 rows
      // per key) would answer 16 — correctness proves no routing
      assert(out.size === 10 && out.values.forall(_ === 64L),
        s"stale twin must not be routed to: $out")
      // refresh incorporates the delta → routing resumes, same answer
      assert(db.refreshBucketed("w").mode === "append")
      val fresh = agg()
      fresh.collect()
      val shuffles = collectWithSubqueries(fresh.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty,
        s"post-refresh join must route again:\n${fresh.queryExecution.executedPlan}")
      val out2 = fresh.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out2 === out)
    } finally db.close()
  }

  test("auto-routing under SHARED WRITERS (lockMode=verb): sibling mutation → fallback, sibling refresh → reroute") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine}
    import java.sql.Timestamp
    Engine.installOptimizations(spark)
    val root = java.nio.file.Files.createTempDirectory("bverb").toString
    def cfg = ChronoConfig(root, bucket = "day", keyBuckets = 4,
      lockMode = "verb", lockWaitMs = 120000L)
    val a = new ChronoDB(spark, cfg)
    val b = new ChronoDB(spark, cfg)
    try {
      def rows(tag: Int) = (0 until 40).map(i => ChronoRow(s"k${i % 10}",
        Timestamp.valueOf(f"2024-01-${1 + i % 5}%02d 1$tag:00:00"),
        Array[Byte](i.toByte)))
      a.createTable("w"); a.insertSeq("w", rows(0))
      a.rebuildBucketed("w")
      def agg(db: ChronoDB) = db.table("w").select(col("key")).hint("merge")
        .join(db.table("w").select(col("key"), col("ts")).hint("merge"),
          Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      def shufflesOf(df: org.apache.spark.sql.DataFrame) = {
        df.collect()
        collectWithSubqueries(df.queryExecution.executedPlan) {
          case s: ShuffleExchangeLike => s
        }
      }
      // verb-mode routing works off the _bucketed_head marker — A
      // routes with zero exchanges right after its own rebuild
      val fresh = agg(a)
      assert(shufflesOf(fresh).isEmpty,
        s"verb-mode fresh twin must route:\n${fresh.queryExecution.executedPlan}")
      assert(fresh.collect().map(_.getLong(1)).forall(_ === 16L))
      // a SIBLING handle mutates: A's per-handle memo knows nothing —
      // the head moved, so A must fall back to the plain scan and see
      // the sibling's rows (8 per key per side → 64 pairs)
      b.insertSeq("w", rows(1))
      val stale = agg(a)
      val out = stale.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size === 10 && out.values.forall(_ === 64L),
        s"sibling mutation must disable routing: $out")
      // the SIBLING refreshes the twin: A reroutes (marker == head
      // again) with no invalidation call on A — and A's plan must see
      // the twin files the sibling appended (refreshTable on reroute)
      assert(b.refreshBucketed("w").mode === "append")
      val rerouted = agg(a)
      assert(shufflesOf(rerouted).isEmpty,
        s"sibling refresh must restore routing:\n${rerouted.queryExecution.executedPlan}")
      val out2 = rerouted.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out2 === out, s"rerouted answer must match plain: $out2")
    } finally { a.close(); b.close() }
  }

  test("auto-routing: time-filtered scans keep the plain layout's partition pruning") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine, PlanMetrics}
    import java.sql.Timestamp
    Engine.installOptimizations(spark)
    val root = java.nio.file.Files.createTempDirectory("btime").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 4, writersPerBucket = 1))
    try {
      def rows(off: Int) = (0 until 40).map(i => ChronoRow(s"k${i % 10}",
        Timestamp.valueOf(f"2024-01-${1 + i % 5 + off}%02d 10:00:00"),
        Array[Byte](i.toByte)))
      db.createTable("t"); db.insertSeq("t", rows(0))
      db.rebuildBucketed("t")
      // a ts-bounded key join: the ts side must NOT be rerouted — its
      // plain scan prunes to 1 of 5 day buckets, which the key-hashed
      // twin cannot do
      val filtered = db.table("t")
        .filter(col("ts") >= lit(Timestamp.valueOf("2024-01-02 00:00:00")) &&
          col("ts") <= lit(Timestamp.valueOf("2024-01-02 23:59:59")))
        .select(col("key"), col("ts"))
      val j = filtered.join(db.table("t").select(col("key")), Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      j.collect()
      val scans = collectWithSubqueries(j.queryExecution.executedPlan) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      // the ts-bounded side must KEEP the plain manifest scan with its
      // derived bucket partition filter, pruned to exactly 1 of 5 day
      // files — a reroute to the key-hashed twin would have lost that
      val prunedScan = scans.find(_.partitionFilters.exists(
        _.references.exists(_.name == "bucket")))
      assert(prunedScan.isDefined,
        s"filtered side lost its partition filter:\n${j.queryExecution.executedPlan}")
      assert(prunedScan.get.metrics("numFiles").value === 1,
        s"filtered side must read exactly its day's file:\n${j.queryExecution.executedPlan}")
      // the UNfiltered side is free to route — and should have
      assert(scans.exists(_.relation.bucketSpec.isDefined),
        s"unfiltered side should have routed to the twin:\n${j.queryExecution.executedPlan}")
    } finally db.close()
  }

  test("auto-routing: a ts filter ABOVE the join also blocks that side's reroute (r15 gap)") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine}
    import java.sql.Timestamp
    Engine.installOptimizations(spark)
    val root = java.nio.file.Files.createTempDirectory("btimeabove").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 4, writersPerBucket = 1))
    try {
      def rows(off: Int) = (0 until 40).map(i => ChronoRow(s"k${i % 10}",
        Timestamp.valueOf(f"2024-01-${1 + i % 5 + off}%02d 10:00:00"),
        Array[Byte](i.toByte)))
      db.createTable("t"); db.insertSeq("t", rows(0))
      db.rebuildBucketed("t")
      // a LEFT OUTER join with a NON-null-rejecting ts predicate above
      // it: the filter cannot push into the right side (outer join) and
      // EliminateOuterJoin cannot convert it (null-tolerant), so it
      // survives ABOVE the join into rule application — the r15 gap
      // where the old subtree-only check let the ts side reroute to the
      // key-hashed twin and lose time pruning
      val left = db.table("t").select(col("key")).distinct()
      val right = db.table("t").select(col("key"), col("ts"))
      val j = left.join(right, Seq("key"), "left_outer")
        .filter(col("ts").isNull ||
          col("ts") <= lit(Timestamp.valueOf("2024-01-02 23:59:59")))
        .groupBy(col("key")).agg(count(col("ts")).as("n"))
      j.collect()
      val scans = collectWithSubqueries(j.queryExecution.executedPlan) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      // the ts-carrying side must have KEPT the plain layout — a
      // reroute would show its scan with a bucket spec
      val twinScans = scans.count(_.relation.bucketSpec.isDefined)
      assert(twinScans <= 1,
        s"ts-filtered side rerouted to the twin:\n${j.queryExecution.executedPlan}")
      assert(scans.exists(_.relation.bucketSpec.isEmpty),
        s"expected the ts side on the plain layout:\n${j.queryExecution.executedPlan}")
    } finally db.close()
  }

  test("auto-routing guards: renames, multi-leaf subtrees and foreign scans never route") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Engine}
    import java.sql.Timestamp
    Engine.installOptimizations(spark)
    val root = java.nio.file.Files.createTempDirectory("bguard").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 4))
    try {
      def rows(off: Int) = (0 until 40).map(i => ChronoRow(s"k${i % 10}",
        Timestamp.valueOf(f"2024-01-${1 + i % 5 + off}%02d 10:00:00"),
        Array[Byte](i.toByte)))
      db.createTable("g"); db.insertSeq("g", rows(0))
      db.rebuildBucketed("g")
      def twinScans(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        collectWithSubqueries(df.queryExecution.executedPlan) {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.bucketSpec.isDefined => s
        }.size
      }
      // (a) a RENAMED key breaks the exprId trace — conservative skip
      val renamed = db.table("g").select(col("key").as("k2"))
        .join(db.table("g").select(col("key").as("k2"), col("ts")), Seq("k2"))
        .groupBy(col("k2")).agg(count(lit(1)).as("n"))
      assert(twinScans(renamed) === 0,
        "renamed join keys must not route (exprId trace lost)")
      // result still correct on the plain path
      assert(renamed.collect().map(_.getLong(1)).forall(_ === 16L))
      // (b) a join on a NON-key column never routes
      val onTs = db.table("g").select(col("ts"))
        .join(db.table("g").select(col("ts"), col("key")), Seq("ts"))
        .groupBy(col("ts")).agg(count(lit(1)).as("n"))
      assert(twinScans(onTs) === 0, "non-key equi joins must not route")
      // (c) a union beneath the join = multiple leaves — skip, correct
      val unioned = db.table("g").select(col("key"))
        .union(db.table("g").select(col("key")))
      val j = unioned.hint("merge")
        .join(db.table("g").select(col("key"), col("ts")).hint("merge"),
          Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      j.collect()
      assert(j.collect().map(_.getLong(1)).forall(_ === 32L),
        "multi-leaf side must still answer correctly")
      // (d) a non-chrono parquet scan with a `key` column never routes
      val foreignDir = java.nio.file.Files.createTempDirectory("bguard_f")
      db.table("g").select(col("key")).write.mode("overwrite")
        .parquet(foreignDir.toString)
      val foreign = spark.read.parquet(foreignDir.toString)
      val fj = foreign.join(db.table("g").select(col("key"), col("ts")),
          Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      fj.collect()
      val foreignScans = collectWithSubqueries(fj.queryExecution.executedPlan) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("bguard_f")) => s
      }
      assert(foreignScans.forall(_.relation.bucketSpec.isEmpty),
        "a foreign parquet scan must never be substituted")
      assert(fj.collect().map(_.getLong(1)).forall(_ === 16L))
    } finally db.close()
  }

  test("refreshBucketed appends only the delta, stays exchange-free, rebuilds after compact") {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("bref").toString
    val db = new ChronoDB(spark,
      ChronoConfig(root, bucket = "day", keyBuckets = 4,
        compactFileThreshold = 1))
    try {
      def rows(off: Int, tag: Int) = (0 until 40).map(i =>
        ChronoRow(s"k${i % 10}",
          Timestamp.valueOf(f"2024-01-${1 + i % 5 + off}%02d 1$tag:00:00"),
          Array[Byte](i.toByte)))
      db.createTable("z"); db.insertSeq("z", rows(0, 0))
      db.rebuildBucketed("z")
      val twinDir = java.nio.file.Paths.get(root, "z", "_bucketed")
      def twinFiles() = {
        val s = java.nio.file.Files.list(twinDir)
        try { import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet }
        finally s.close()
      }
      val before = twinFiles()
      // current twin → refresh is a no-op
      assert(db.refreshBucketed("z") ===
        graft.core.BucketedRefresh("noop", 0))
      assert(twinFiles() === before)
      // new ingest → refresh APPENDS (original twin files untouched)
      db.insertSeq("z", rows(0, 1))
      val r = db.refreshBucketed("z")
      assert(r.mode === "append" && r.files > 0)
      assert(before.subsetOf(twinFiles()),
        "append must not rewrite existing twin files")
      assert(db.bucketedTable("z").count() === 80)
      // the appended twin still joins exchange-free on key
      val j = db.bucketedTable("z").select(col("key")).hint("merge")
        .join(db.bucketedTable("z").select(col("key"), col("ts"))
          .hint("merge"), Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      j.collect()
      val shuffles = collectWithSubqueries(j.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty, s"post-append key join must stay " +
        s"exchange-free:\n${j.queryExecution.executedPlan}")
      // compact rewrites history → refresh falls back to a full rebuild
      db.compact("z")
      val r2 = db.refreshBucketed("z")
      assert(r2.mode === "rebuild")
      assert(db.bucketedTable("z").count() === 80)
      // a crashed append (twin files unknown to state) also rebuilds —
      // appending the same delta twice would duplicate rows
      db.insertSeq("z", rows(0, 2))
      val stray = twinDir.resolve("part-99999-crashed.c000.parquet")
      val donor = twinFiles().head
      java.nio.file.Files.copy(twinDir.resolve(donor), stray)
      val r3 = db.refreshBucketed("z")
      assert(r3.mode === "rebuild")
      assert(db.bucketedTable("z").count() === 120)
    } finally db.close()
  }
}
