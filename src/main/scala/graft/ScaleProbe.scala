package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scaling probe for parameter sweeps the declared queries pin
  * for oracle reasons. First use: semanticDedup's nlist lever — the
  * declared d33 fixes nlist=16 (oracle-expressible seeded centroids),
  * which makes within-cluster pair mass grow quadratically when the
  * corpus grows and the cluster count doesn't. SemDeDup's own recipe
  * scales cluster count with the corpus; this measures that lever on
  * the derived fixtures so BASELINE.md's scaling section reports the
  * production path with numbers, not an argument.
  *
  * Second use: the large-batch upsert/delete path — ChronoDB routes
  * key sets past `literalKeyLimit` through the semi-join
  * (`deleteMatching`) path instead of driver literals; this measures
  * that path end-to-end on a derived-scale events table so SCALE.md §5
  * carries a number, not an adjective.
  *
  * Usage: sbt "runMain graft.ScaleProbe <sfDir> <nlist> [threshold]"
  *        sbt "runMain graft.ScaleProbe upsert <sfDir>"
  * Prints one JSON line: {"probe":"semantic_dedup","nlist":N,
  * "rows":n,"keepers":k,"warm_sec":…,"min_sec":…} or the upsert twin.
  */
object ScaleProbe {
  /** Timed-run count after the warm-up (default 3; SPARK_GRAFT_PROBE_RUNS
    * trims it for third-decade points where one run is minutes). */
  private def probeRuns: Int =
    sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt

  /** Recursive delete for probe temp dirs — probes write multi-GB
    * parquet copies under /tmp; leaking them across invocations fills
    * the disk on a sweep. */
  private def rmrf(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } finally s.close()
    }
  }

  /** Task-metric totals for the memory-pressure proof: Tungsten spill
    * bytes (memory-resident data force-written to disk by execution
    * memory pressure), disk spill bytes, and the largest single-task
    * peak execution memory — summed/maxed over every task since
    * registration. local[*] runs one JVM, so these ARE the engine's
    * whole memory story for a probe run. */
  private final class SpillListener
      extends org.apache.spark.scheduler.SparkListener {
    val memSpilled = new java.util.concurrent.atomic.AtomicLong
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong
    val peakExecMem = new java.util.concurrent.atomic.LongAccumulator(
      new java.util.function.LongBinaryOperator {
        def applyAsLong(a: Long, b: Long): Long = math.max(a, b)
      }, 0L)
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
        peakExecMem.accumulate(m.peakExecutionMemory)
      }
    }
    /** `"spill_mem_mb":…,` fragment for the probe JSON line (heap size
      * included so an artifact is self-describing about the pressure
      * it ran under). */
    def json: String = {
      val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
      s""""heap_max_mb":$heapMb,"spill_mem_mb":${memSpilled.get / (1024 * 1024)},"spill_disk_mb":${diskSpilled.get / (1024 * 1024)},"peak_task_exec_mb":${peakExecMem.get / (1024 * 1024)},"""
    }
  }

  private def withSpill(spark: SparkSession): SpillListener = {
    val l = new SpillListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("upsert"))
      return upsertProbe(args(1),
        if (args.length > 2) args(2) else "user_id")
    if (args.headOption.contains("bucketjoin")) return bucketJoinProbe(args(1))
    if (args.headOption.contains("lifecycle")) return lifecycleProbe(args(1))
    if (args.headOption.contains("dml"))
      return dmlProbe(args(1), if (args.length > 2) args(2).toInt else 1)
    if (args.headOption.contains("history"))
      return historyProbe(args(1), if (args.length > 2) args(2).toInt else 1)
    if (args.headOption.contains("feedbacklog"))
      return feedBacklogProbe(args(1).toInt)
    if (args.headOption.contains("feedtrigger"))
      return feedTriggerProbe(args(1).toInt)
    if (args.headOption.contains("zorderverb"))
      return zorderVerbProbe(args(1),
        if (args.length > 2) args(2).toInt else 1)
    if (args.headOption.contains("annserve"))
      return annServeProbe(args(1),
        if (args.length > 2) args(2).toInt else 1)
    if (args.headOption.contains("anndelta"))
      return annDeltaProbe(args(1),
        if (args.length > 2) args(2).toInt else 1,
        if (args.length > 3) args(3).toInt else 1)
    if (args.headOption.contains("sharedwriters"))
      return sharedWritersProbe(args(1).toInt, args(2).toInt)
    if (args.headOption.contains("tailsource")) return tailSourceProbe(args(1))
    if (args.headOption.contains("tailage"))
      return tailAgeProbe(args(1).toInt,
        if (args.length > 2) args(2).toInt else 200)
    if (args.headOption.contains("catalogscan"))
      return catalogScanProbe(args(1).toInt,
        if (args.length > 2) args(2).toInt else 200)
    if (args.headOption.contains("semantic2a"))
      return semantic2AdaptiveProbe(args(1), args(2).toInt, args(3).toInt,
        if (args.length > 4) args(4).toDouble else 0.9,
        if (args.length > 5) args(5).toDouble else 0.35)
    if (args.headOption.contains("semantic2f"))
      return semantic2FittedProbe(args(1), args(2).toInt, args(3).toInt,
        args(4).toInt, if (args.length > 5) args(5).toDouble else 0.35)
    if (args.headOption.contains("semantic2"))
      return semantic2Probe(args(1), args(2).toInt, args(3).toInt,
        args(4).toInt, if (args.length > 5) args(5).toDouble else 0.35)
    if (args.headOption.contains("substr"))
      return substrProbe(args(1), if (args.length > 2) args(2).toInt else 8,
        hashGrams = false)
    if (args.headOption.contains("substrh"))
      return substrProbe(args(1), if (args.length > 2) args(2).toInt else 8,
        hashGrams = true)
    if (args.headOption.contains("skewsubstr"))
      return skewSubstrProbe(args(1))
    if (args.headOption.contains("neardup")) return neardupProbe(args(1))
    if (args.headOption.contains("zorder")) return zorderProbe(args(1))
    if (args.headOption.contains("skewjoin")) return skewJoinProbe(args(1))
    if (args.headOption.contains("skewlsh")) return skewLshProbe(args(1))
    if (args.headOption.contains("envdelete")) return envDeleteProbe(args(1))
    val sfDir = args(0)
    val nlist = args(1).toInt
    val threshold = if (args.length > 2) args(2).toDouble else 0.35
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val rows = emb.count()
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val k = graft.operators.Dedup
          .semanticDedup(emb, "vec_id", "embedding", threshold, nlist)
          .count()
        (k, (System.nanoTime() - t0) / 1e9)
      }
      val (_, warm) = once()
      val runs = Seq.fill(probeRuns)(once())
      val keepers = runs.head._1
      val minSec = runs.map(_._2).min
      println(f"""{"probe":"semantic_dedup","nlist":$nlist,"rows":$rows,"keepers":$keepers,"warm_sec":$warm%.4f,"min_sec":$minSec%.4f,"timed_runs":$probeRuns}""")
    } finally spark.stop()
  }

  /** Two-level-quantizer lever for semantic dedup (the r12 follow-up to
    * the flat-nlist sweep): measures [[graft.operators.Dedup.semanticDedupTwoLevel]]
    * at a given (nlist, ncoarse, nprobe) against the same derived
    * fixture, so BASELINE.md can show the O(nlist) flat-assignment wall
    * falling to O(ncoarse + nprobe·nlist/ncoarse). Also reports the
    * assignment-agreement fraction vs the flat argmax at the same nlist
    * — the recall half of the trade, in the same artifact line. */
  private def semantic2Probe(sfDir: String, nlist: Int, ncoarse: Int,
      nprobe: Int, threshold: Double): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val rows = emb.count()
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val k = graft.operators.Dedup.semanticDedupTwoLevel(
            emb, "vec_id", "embedding", threshold, nlist, ncoarse, nprobe)
          .count()
        (k, (System.nanoTime() - t0) / 1e9)
      }
      val (_, warm) = once()
      val runs = Seq.fill(probeRuns)(once())
      val keepers = runs.head._1
      val minSec = runs.map(_._2).min
      // agreement vs the flat argmax: threshold > 1 keeps every row, so
      // both outputs are the raw assignment surface (id -> cell).
      // SPARK_GRAFT_PROBE_AGREE=0 skips it — at third-decade corpus
      // sizes the flat argmax inside the agreement pass costs more than
      // the probe itself
      val flat = graft.operators.Dedup
        .semanticDedup(emb, "vec_id", "embedding", 1.1, nlist)
        .withColumnRenamed("cell", "cell_flat")
      val agree =
        if (sys.env.get("SPARK_GRAFT_PROBE_AGREE").contains("0")) -1.0
        else graft.operators.Dedup
          .semanticDedupTwoLevel(emb, "vec_id", "embedding", 1.1,
            nlist, ncoarse, nprobe)
          .join(flat, Seq("vec_id"))
          .agg(avg((col("cell") === col("cell_flat")).cast("double")))
          .collect()(0).getDouble(0)
      println(f"""{"probe":"semantic_dedup_two_level","nlist":$nlist,"ncoarse":$ncoarse,"nprobe":$nprobe,"rows":$rows,"keepers":$keepers,"warm_sec":$warm%.4f,"min_sec":$minSec%.4f,"assign_agree":$agree%.4f,"timed_runs":$probeRuns}""")
    } finally spark.stop()
  }

  /** Fitted-codebook × two-level probe (r13 VERDICT #4): the d33g
    * composition at derived scale. The k-means fit is timed ONCE and
    * reported separately (production fits a codebook once and assigns
    * many corpora against it); the timed runs cover the
    * assign+pair+drop path over the already-built codebook, directly
    * comparable to semantic2's min_sec at the same
    * (nlist, ncoarse, nprobe). */
  private def semantic2FittedProbe(sfDir: String, nlist: Int, ncoarse: Int,
      nprobe: Int, threshold: Double): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spill = withSpill(spark)
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val rows = emb.count()
      // Fit on a bounded deterministic sample (≤256·nlist points, the
      // standard IVF training budget): a full-corpus k-means at 2 M
      // vectors times the fit, not the engine, and production trains
      // codebooks on samples for exactly this reason. The gate query
      // (d33g) still fits on its whole gate-SF corpus.
      val fitBudget = 256L * nlist
      val fitDf =
        if (rows <= fitBudget) emb
        else emb.sample(withReplacement = false,
          fraction = math.min(1.0, fitBudget.toDouble / rows * 1.05),
          seed = 42L)
      val tFit0 = System.nanoTime()
      val fine = graft.operators.Dedup
        .fittedCentroids(fitDf, "vec_id", "embedding", nlist)
      val fitSec = (System.nanoTime() - tFit0) / 1e9
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val k = graft.operators.Dedup.semanticDedupTwoLevelOver(
            emb, "vec_id", "embedding", threshold, fine, ncoarse, nprobe)
          .count()
        (k, (System.nanoTime() - t0) / 1e9)
      }
      val (_, warm) = once()
      val runs = Seq.fill(probeRuns)(once())
      val keepers = runs.head._1
      val minSec = runs.map(_._2).min
      println(f"""{"probe":"semantic_dedup_fitted_two_level","nlist":$nlist,"ncoarse":$ncoarse,"nprobe":$nprobe,"rows":$rows,"keepers":$keepers,${spill.json}"fit_sec":$fitSec%.4f,"warm_sec":$warm%.4f,"min_sec":$minSec%.4f,"timed_runs":$probeRuns}""")
    } finally spark.stop()
  }

  /** Composed maintenance lifecycle at derived scale (r14 VERDICT #8):
    * every piece — orphan quarantine, vacuum GC, incremental bucketed
    * refresh, compact, the consistency verbs — has its own spec, but no
    * single measured run had composed them. This probe runs the life a
    * real table lives, on a derived-scale events fixture, asserting
    * sidecar consistency at every seam:
    *
    *   insert(half 1) → rebuildBucketed → insert(half 2) →
    *   crash-simulated ORPHAN file → [scan unchanged, consistency
    *   check FAILS as designed] → vacuumOrphans(0) → [consistency
    *   repaired] → refreshBucketed [must APPEND — the orphan episode
    *   must not have poisoned the twin state] → [twin == table] →
    *   compact → refreshBucketed [must REBUILD — history rewritten] →
    *   [twin == table, manifest + sidecars consistent, key-join on the
    *   twin zero-exchange]
    *
    * One JSON line with per-phase wall-clocks and every assertion as a
    * boolean — a false anywhere is a probe failure, not a soft note. */
  private def lifecycleProbe(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("lifecycle").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day", keyBuckets = 8,
        compactFileThreshold = 4,
        // r17 snapshot grace ON: the probe asserts a reader that planned
        // BEFORE compact still collects its full snapshot AFTER it
        trashGraceMs = 3600000L))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val ev = graft.core.Tables.t(spark, sfDir, "events")
        .select(col("user_id").cast("string").as("key"), col("ts"),
          encode(col("event_type"), "UTF-8").as("data"))
        .as[graft.core.ChronoRow]
      db.createTable("ev")
      // split by KEY hash, not time: both batches then touch EVERY time
      // bucket, so the second insert really fragments buckets the first
      // wrote (a time split would give each bucket exactly one batch and
      // compact would be a no-op — not the lifecycle under test). The
      // seed literal DECORRELATES this split from the insert path's
      // writer salt (the same xxhash64(key, ts)) — an unseeded split
      // would hand each half only half the salt lanes, halving files
      // per bucket and making compaction a no-op again.
      val half = pmod(xxhash64(lit("lifecycle"), col("key"), col("ts")), lit(2))
      val (_, insert1Sec) = timed(db.insert("ev", ev.filter(half === 0)))
      val (_, build1Sec) = timed(db.rebuildBucketed("ev"))
      val (_, insert2Sec) = timed(db.insert("ev", ev.filter(half === 1)))
      val total = db.table("ev").count()
      // crash-simulated orphan: a committed file byte-copied under a
      // name the manifest never recorded
      val bucketDir = {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(root, "ev"))
        try { import scala.jdk.CollectionConverters._
          s.iterator().asScala.find(
            _.getFileName.toString.startsWith("bucket=")).get }
        finally s.close()
      }
      val victim = {
        val s = java.nio.file.Files.list(bucketDir)
        try { import scala.jdk.CollectionConverters._
          s.iterator().asScala.find { f =>
            val n = f.getFileName.toString
            n.endsWith(".parquet") && !n.startsWith(".") }.get }
        finally s.close()
      }
      val orphan = bucketDir.resolve("part-crashed-orphan.parquet")
      java.nio.file.Files.copy(victim, orphan)
      // a REAL crashed insert's files are minutes-to-days old by vacuum
      // time; pin that age so horizonMs=0 is unambiguous (a same-ms
      // mtime would not be strictly older than the cutoff)
      java.nio.file.Files.setLastModifiedTime(orphan,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 60000L))
      val orphanInvisible = db.table("ev").count() == total
      val inconsistentSeen = !db.manifestConsistent("ev")
      val (vacuumed, vacuumSec) = timed(db.vacuumOrphans("ev", horizonMs = 0L))
      val repairedAfterVacuum = db.manifestConsistent("ev")
      val (r1, refresh1Sec) = timed(db.refreshBucketed("ev"))
      val appendAfterVacuum = r1.mode == "append"
      val twinMatches1 = db.bucketedTable("ev").count() == total
      // a "reader planned pre-compact" = the explicit pre-compact file
      // set; under the snapshot grace it must still collect the FULL
      // table after compact rewrites the layout (VERDICT r16 Missing #4)
      val preCompactFiles = graft.sources.ChronoLayout
        .listEntries(java.nio.file.Paths.get(root, "ev"))
        .map(e => s"$root/ev/bucket=${e.bucket}/${e.file}")
      val (nCompacted, compactSec) = timed(db.compact("ev"))
      val compactedSomething = nCompacted > 0
      val graceSnapshotOk =
        spark.read.parquet(preCompactFiles: _*).count() == total
      val (r2, refresh2Sec) = timed(db.refreshBucketed("ev"))
      val rebuildAfterCompact = r2.mode == "rebuild"
      val twinMatches2 = db.bucketedTable("ev").count() == total
      val allConsistent = db.manifestConsistent("ev") &&
        db.sidecarsConsistent("ev")
      // the twin the lifecycle maintained still joins exchange-free
      val j = db.bucketedTable("ev").select(col("key")).hint("merge")
        .join(db.bucketedTable("ev").select(col("key"), col("ts"))
          .hint("merge"), Seq("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      j.collect()
      val zeroExchange = graft.core.PlanMetrics.shuffleExchanges(
        j.queryExecution.executedPlan) == 0L
      val ok = orphanInvisible && inconsistentSeen && vacuumed == 1 &&
        repairedAfterVacuum && appendAfterVacuum && twinMatches1 &&
        compactedSomething && graceSnapshotOk && rebuildAfterCompact &&
        twinMatches2 && allConsistent && zeroExchange
      println(f"""{"probe":"lifecycle","rows":$total,"insert1_sec":$insert1Sec%.3f,"build_sec":$build1Sec%.3f,"insert2_sec":$insert2Sec%.3f,"vacuumed":$vacuumed,"vacuum_sec":$vacuumSec%.3f,"refresh_append_sec":$refresh1Sec%.3f,"compacted":$nCompacted,"compact_sec":$compactSec%.3f,"refresh_rebuild_sec":$refresh2Sec%.3f,"orphan_invisible":$orphanInvisible,"inconsistency_detected":$inconsistentSeen,"repaired_after_vacuum":$repairedAfterVacuum,"append_after_vacuum":$appendAfterVacuum,"twin_matches_after_append":$twinMatches1,"grace_snapshot_ok":$graceSnapshotOk,"rebuild_after_compact":$rebuildAfterCompact,"twin_matches_after_rebuild":$twinMatches2,"all_sidecars_consistent":$allConsistent,"twin_join_zero_exchange":$zeroExchange,"ok":$ok}""")
      if (!ok) sys.exit(1)
    } finally {
      db.close()
      rmrf(root)
    }
  }

  /** Row-level DML vs TABLE AGE (r17): the copy-on-write verbs' cost
    * must track the AFFECTED window, not the table — at 100 TB a
    * 3-bucket DELETE/UPDATE/MERGE on a decade-old table has to read and
    * rewrite three buckets' worth of data, full stop. `mult` replicates
    * the fixture with shifted ts (mult× the BUCKET COUNT, same rows per
    * bucket, same fixed 3-bucket mutation window): run at mult=1 and
    * mult=10, the delete/update/merge timings must be FLAT while table
    * age grows 10× — and the probe asserts the untouched buckets'
    * file lists are BYTE-IDENTICAL before/after each verb (nothing
    * outside the window was rewritten), plus exact row accounting. The
    * MERGE runs through the real SQL path (catalog + extension), so the
    * measurement covers the whole stack, not just the facade tail. */
  /** Version-history scale probe (`history <sfDir> <mult>`): mult× the
    * table AGE (same aging trick as the dml probe), then measure the
    * costs the time-travel design claims are flat or delta-sized —
    * per-commit record overhead (small inserts), snapshot
    * reconstruction + read at head, a 3-bucket delete, the SUPERSEDED
    * snapshot read after it (grace-retained), and the change feed
    * between the two versions (must price at the changed window, never
    * the table). */
  /** Change-feed BACKLOG probe (`feedbacklog <nCommits>`): a catch-up
    * batch over an n-commit backlog must plan as ONE frame (two scan
    * legs, `_commit_version` a partition column of the file index —
    * [[graft.core.ChronoChanges.versionedFrame]]), so its per-commit
    * cost must FALL (fixed overhead amortizing), never rise. The
    * pre-r18 union-per-commit plan paid analyzer/optimizer work
    * superlinear in n before a row moved. Reported: wall seconds and
    * ms/commit for one full-backlog batch, plus the capped first
    * trigger (maxCommitsPerTrigger = 10) whose cost must be flat in n
    * (admission control: backlog size must not leak into a single
    * trigger's price). */
  /** Shared-writer CONTENTION probe (`sharedwriters <writers> <n>`):
    * `writers` verb-mode handles on one root, each committing `n`
    * single-row inserts from its own thread, against a 1-writer
    * baseline of the same total. What it prices: the commit critical
    * section (lease acquire + manifest append + history record — a few
    * KB-scale fs ops) bounds COMMIT rate, not data rate; real
    * pipelines batch rows per commit, so commits/sec here is the floor
    * a 1000-executor cluster's writers queue on, exactly like Delta's
    * per-commit OCC. */
  private def sharedWritersProbe(writers: Int, n: Int): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(k: Int, per: Int): Double = {
      val root = java.nio.file.Files.createTempDirectory("swprobe").toString
      val cfg = graft.core.ChronoConfig(root, bucket = "day",
        sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
        writersPerBucket = 1, lockMode = "verb", lockWaitMs = 600000L)
      val handles = (0 until k).map(_ => new graft.core.ChronoDB(spark, cfg))
      try {
        handles.head.createTable("t")
        val pool = java.util.concurrent.Executors.newFixedThreadPool(k)
        val t0 = System.nanoTime()
        val fs = (0 until k).map { w =>
          pool.submit(new Runnable {
            override def run(): Unit =
              (1 to per).foreach(i => handles(w).insertSeq("t",
                Seq(graft.core.ChronoRow(s"w${w}_$i",
                  java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
                  Array((i % 127).toByte)))))
          })
        }
        fs.foreach(_.get())
        pool.shutdown()
        val sec = (System.nanoTime() - t0) / 1e9
        require(handles.head.table("t").count() == k.toLong * per,
          "lost rows under contention")
        require(handles.head.history("t").map(_.version).sorted ==
          (0L to (k.toLong * per)), "non-dense history under contention")
        sec
      } finally handles.foreach(_.close())
    }
    run(1, 5) // warm
    val base = run(1, writers * n)
    val contended = run(writers, n)
    val total = writers * n
    println(f"""{"probe":"sharedwriters","writers":$writers,"commits":$total,"single_writer_sec":$base%.2f,"single_commits_per_sec":${total / base}%.2f,"contended_sec":$contended%.2f,"contended_commits_per_sec":${total / contended}%.2f}""")
    spark.stop()
  }

  private def feedBacklogProbe(nCommits: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("feedprobe").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day", sketchLgK = 0,
        sketchCmsDepth = 0, sketchBloomKeys = 0, writersPerBucket = 1,
        trashGraceMs = 3600000L))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      db.createTable("ev")
      import spark.implicits._
      (1 to nCommits).foreach { i =>
        db.insertSeq("ev", Seq(graft.core.ChronoRow(s"k$i",
          java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
          Array((i % 127).toByte))))
      }
      val (cfs, tableRoot) = graft.core.ChronoFs.resolve(s"$root/ev",
        spark.sessionState.newHadoopConf())
      // the exact batch plan the source hands the engine (the streaming
      // wrap adds no plan nodes): one versionedFrame over the range
      val dataSchema = graft.core.ManifestFileIndex.withGranularity(
        graft.core.ChronoDB.EnvelopeSchema, "day")
      val cols = dataSchema.fieldNames.toSeq
      def batch(from: Long, to: Long): Long = {
        val commits = ((from + 1) to to).map(v =>
          graft.core.ChronoHistory.readCommit(cfs, tableRoot, v))
        graft.core.ChronoChanges.versionedFrame(spark, tableRoot,
          dataSchema, cols, commits).count()
      }
      // the PRE-r18 shape (one plan leg per commit, union-reduced) —
      // kept here as the A/B so the plan-size claim stays measured,
      // not asserted
      def unionBatch(from: Long, to: Long): Long = {
        val frames = ((from + 1) to to).map { v =>
          val c = graft.core.ChronoHistory.readCommit(cfs, tableRoot, v)
          graft.core.ChronoChanges.frame(spark, tableRoot, dataSchema,
              cols, c.adds, c.removes)
            .withColumn("_commit_version", lit(c.version))
        }
        frames.reduce(_ unionAll _).count()
      }
      // warm the code paths once on a small range
      batch(0, math.min(5L, nCommits.toLong))
      // one batch over the FULL backlog
      val (fullRows, fullSec) = timed(batch(0, nCommits.toLong))
      val (_, unionSec) = timed(unionBatch(0, nCommits.toLong))
      // the capped first trigger: offset reservation + its batch
      import org.apache.spark.sql.execution.streaming.runtime.LongOffset
      val capped = new graft.sources.ChronoChangeFeedSource(spark, cfs,
        tableRoot, "day", 0L,
        java.nio.file.Files.createTempDirectory("feedmeta").toString,
        Some(10))
      val (off, _) = timed(capped.getOffset)
      val capEnd = off.map(o => o.asInstanceOf[LongOffset].offset)
        .getOrElse(0L)
      val (capRows, capSec) = timed(batch(0, capEnd))
      println(f"""{"probe":"feedbacklog","commits":$nCommits,"full_rows":$fullRows,"full_sec":$fullSec%.3f,"ms_per_commit":${fullSec * 1000 / nCommits}%.3f,"capped_end":$capEnd,"capped_rows":$capRows,"capped_sec":$capSec%.3f,"union_per_commit_sec":$unionSec%.3f}""")
    } finally { db.close(); spark.stop() }
  }

  /** VERDICT r18 #1 "Done" axis: the change feed's PER-TRIGGER cost
    * must be FLAT in the table's live-file count. Build a table of
    * `liveFiles` single-file commits spread across hour buckets, then
    * time ONE one-commit trigger (getOffset + the full getBatch incl.
    * the readability gate). The A/B is the pre-r19 gate shape — one
    * Spark job + a full folded-manifest collect — timed at the same
    * table size, so the artifact carries the removed cost, not a
    * claim. Run at e.g. 200 and 10000 and compare trigger_ms. */
  private def feedTriggerProbe(liveFiles: Int): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("feedtrig").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "hour", sketchLgK = 0,
        sketchCmsDepth = 0, sketchBloomKeys = 0, writersPerBucket = 1,
        trashGraceMs = 3600000L))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      db.createTable("ev")
      // grow the LIVE FILE COUNT in few commits: each bulk insert
      // spans 2000 hour buckets → 2000 files per commit (the axis is
      // file count, not commit count); the trigger's own commit below
      // is one small single-bucket insert either way
      val epoch0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      import spark.implicits._
      val bulks = math.max(1, liveFiles / 2000)
      (1 to bulks).foreach { b =>
        val df = spark.range(2000).selectExpr(
          s"concat('k$b-', id) as key",
          s"timestamp_millis(${epoch0}L + id * 3600000L) as ts",
          "encode(cast(id as string), 'UTF-8') as data")
        db.insertFrame("ev", df)
      }
      db.insertSeq("ev", Seq(graft.core.ChronoRow("trigger",
        new java.sql.Timestamp(epoch0), Array(1.toByte))))
      val (cfs, tableRoot) = graft.core.ChronoFs.resolve(s"$root/ev",
        spark.sessionState.newHadoopConf())
      // one ONE-COMMIT trigger's work, exactly the source's getBatch
      // body (offset read + the r19 listing-fallback readability gate +
      // the versioned batch frame), minus the streaming wrap that
      // MicroBatchExecution owns
      val head = graft.core.ChronoHistory.headVersion(cfs, tableRoot).get
      val dataSchema = graft.core.ManifestFileIndex.withGranularity(
        graft.core.ChronoDB.EnvelopeSchema, "hour")
      val cols = dataSchema.fieldNames.toSeq
      def trigger(): (Long, Double) = timed {
        graft.core.ChronoHistory.headVersion(cfs, tableRoot) // getOffset read
        val commits = Seq(
          graft.core.ChronoHistory.readCommit(cfs, tableRoot, head))
        graft.core.ChronoHistory.requireReadable(cfs, tableRoot,
          commits.flatMap(c => c.adds ++ c.removes),
          Set.empty, "feedtrigger probe")
        graft.core.ChronoChanges.versionedFrame(spark, tableRoot,
          dataSchema, cols, commits).count()
      }
      trigger() // warm code paths
      val runs = Seq.fill(probeRuns)(trigger()._2)
      // the PRE-r19 gate shape at this table size: one Spark job + a
      // full folded-manifest driver collect per trigger
      val (liveSize, oldGateSec) = timed {
        graft.sources.ChronoLayout.foldedManifest(spark, cfs, tableRoot)
          .map(_.collect().map(r => (r.getString(0), r.getString(1))).toSet)
          .getOrElse(Set.empty[(String, String)]).size
      }
      println(f"""{"probe":"feedtrigger","live_files":$liveFiles,"manifest_entries":$liveSize,"trigger_ms":${runs.min * 1000}%.1f,"old_gate_ms":${oldGateSec * 1000}%.1f,"timed_runs":$probeRuns}""")
    } finally { db.close(); spark.stop() }
  }

  /** The persistent-ANN-index headline number: amortized SERVE cost
    * from the stored index vs the d3e-class per-query path that fits
    * k-means on every call. Corpus = embeddings × `mult` (ids offset
    * per copy), nlist scaled with the corpus. One buildAnnIndex (timed
    * — the amortized cost), then min-of-3 annTopK serves vs min-of-3
    * fit-per-query ivfTopK runs over the same 16 queries. */
  private def annServeProbe(sfDir: String, mult: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("annserve").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day", sketchLgK = 0,
        sketchCmsDepth = 0, sketchBloomKeys = 0))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val base = emb.count()
      val wide = (0 until mult).map(i => emb
          .select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
        .reduce(_ unionByName _)
      import org.apache.spark.sql.types._
      db.createTable("e", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("ts", TimestampType),
        StructField("embedding", ArrayType(FloatType)))))
      db.insertFrame("e", wide.select(col("vec_id"),
        to_timestamp(lit("2024-01-01 10:00:00")).as("ts"),
        col("embedding")))
      val rows = base * mult
      val nlist = math.max(16, (rows / 2000L).toInt)
      val (_, buildSec) = timed(
        db.buildAnnIndex("e", "vec_id", "embedding", nlist = nlist))
      val queries = db.table("e").filter(col("vec_id") < 16)
      def serve(): Long =
        db.annTopK("e", queries, k = 5, nprobe = 6).count()
      def refit(): Long =
        graft.operators.Similarity.ivfTopK(
          db.table("e").select(col("vec_id"), col("embedding")), queries,
          "vec_id", "embedding", k = 5, nlist = nlist, nprobe = 6).count()
      serve(); refit() // warm both paths
      val serveSec = Seq.fill(probeRuns)(timed(serve())._2).min
      val refitSec = Seq.fill(probeRuns)(timed(refit())._2).min
      println(f"""{"probe":"annserve","mult":$mult,"rows":$rows,"nlist":$nlist,"build_sec":$buildSec%.2f,"serve_sec":$serveSec%.3f,"refit_per_query_path_sec":$refitSec%.3f,"speedup":${refitSec / serveSec}%.1f,"timed_runs":$probeRuns}""")
    } finally { db.close(); spark.stop() }
  }

  /** VERDICT r19 #1 "Done" axis: delta-serve and delta-append priced
    * at the DELTA, never the corpus. Index base×mult rows, then insert
    * ONE fixture copy as a live delta (separate bucket) and measure:
    * serve before the insert (index-only), serve after (stored cells ∪
    * exact delta scan — must sit near the index-only cost, NOT near a
    * corpus scan), the delta APPEND (assigns only the new rows), a
    * serve after the append (index-only again), and a full rebuild as
    * the price delta-append avoids. `deltaMult` scales the delta
    * (fixture copies) independently of the corpus — the delta-SLOPE
    * axis: serve/append cost must track the delta size, not the
    * corpus. */
  private def annDeltaProbe(sfDir: String, mult: Int,
      deltaMult: Int = 1): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("anndelta").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day", sketchLgK = 0,
        sketchCmsDepth = 0, sketchBloomKeys = 0))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val base = emb.count()
      val wide = (0 until mult).map(i => emb
          .select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
        .reduce(_ unionByName _)
      import org.apache.spark.sql.types._
      db.createTable("e", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("ts", TimestampType),
        StructField("embedding", ArrayType(FloatType)))))
      db.insertFrame("e", wide.select(col("vec_id"),
        to_timestamp(lit("2024-01-01 10:00:00")).as("ts"),
        col("embedding")))
      val rows = base * mult
      val nlist = math.max(16, (rows / 2000L).toInt)
      db.buildAnnIndex("e", "vec_id", "embedding", nlist = nlist)
      val queries = db.table("e").filter(col("vec_id") < 16)
      def serve(): Long =
        db.annTopK("e", queries, k = 5, nprobe = 6).count()
      serve() // warm
      val freshSec = Seq.fill(probeRuns)(timed(serve())._2).min
      // the live delta: deltaMult fixture copies, their own bucket
      val deltaWide = (0 until deltaMult).map(i => emb
          .select((col("vec_id") +
            lit((mult + i).toLong * 10000000L)).as("vec_id"),
            col("embedding")))
        .reduce(_ unionByName _)
      db.insertFrame("e", deltaWide.select(col("vec_id"),
        to_timestamp(lit("2024-01-02 10:00:00")).as("ts"),
        col("embedding")))
      serve() // warm the union path
      val deltaSec = Seq.fill(probeRuns)(timed(serve())._2).min
      val (_, appendSec) = timed {
        require(db.buildAnnIndexIfStale("e"), "append must run")
      }
      require(db.annIndexFresh("e"), "append must restore Fresh")
      serve() // warm
      val afterSec = Seq.fill(probeRuns)(timed(serve())._2).min
      val (_, rebuildSec) = timed(
        db.buildAnnIndex("e", "vec_id", "embedding", nlist = nlist))
      println(f"""{"probe":"anndelta","mult":$mult,"rows":$rows,"delta_rows":${base * deltaMult},"nlist":$nlist,"serve_fresh_sec":$freshSec%.3f,"serve_delta_sec":$deltaSec%.3f,"serve_after_append_sec":$afterSec%.3f,"append_sec":$appendSec%.2f,"rebuild_sec":$rebuildSec%.2f,"append_speedup":${rebuildSec / appendSec}%.1f,"timed_runs":$probeRuns}""")
    } finally { db.close(); spark.stop() }
  }

  /** VERDICT r18 #2 "Done" axis: the zorder VERB at a scale multiple
    * with NO table-sized block-manager pinning. Pre-r19 the verb
    * localCheckpoint'd the entire table (non-recomputable executor
    * storage = table size); now the rewrite streams through the
    * stage-then-adopt path — `pinned_cached_partitions` must be 0 after
    * the verb, and heap/spill ride the probe's listener. */
  private def zorderVerbProbe(sfDir: String, mult: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spill = withSpill(spark)
    val root = java.nio.file.Files.createTempDirectory("zverbprobe").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day", sketchLgK = 0,
        sketchCmsDepth = 0, sketchBloomKeys = 0, writersPerBucket = 2))
    try {
      val ev = graft.core.Tables.normTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      val wide = (0 until mult).map(i => ev
          .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000L)))
        .reduce(_ unionByName _)
        .select(col("event_id").cast("string").as("key"), col("ts"),
          col("user_id").as("v"))
      import org.apache.spark.sql.types._
      db.createTable("t", StructType(Seq(
        StructField("key", StringType), StructField("ts", TimestampType),
        StructField("v", LongType))))
      db.insertFrame("t", wide)
      val rows = db.table("t").count()
      val t0 = System.nanoTime()
      val buckets = db.zorder("t", Seq("v", "ts"), bits = 16,
        filesPerBucket = 4)
      val sec = (System.nanoTime() - t0) / 1e9
      // the metric is CACHED PARTITIONS actually pinned in the block
      // manager, not the count of registered RDDs (an unrelated cached
      // RDD elsewhere in the session would flip the verdict; an RDD
      // registered but never materialized pins nothing) — ADVICE r19
      val pinned = spark.sparkContext.getRDDStorageInfo
        .map(_.numCachedPartitions.toLong).sum
      println(f"""{"probe":"zorderverb","mult":$mult,"rows":$rows,"buckets_rewritten":$buckets,"zorder_sec":$sec%.2f,"pinned_cached_partitions":$pinned,${spill.json}"ok":${pinned == 0L}}""")
    } finally { db.close(); spark.stop() }
  }

  private def historyProbe(sfDir: String, mult: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("histprobe").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day",
        trashGraceMs = 3600000L))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType)))
      val base = graft.core.Tables.t(spark, sfDir, "events")
        .select(col("user_id").cast("string").as("key"), col("ts"),
          col("event_id").cast("long").as("v"))
      val aged = base.crossJoin(
          spark.range(mult).select(col("id").as("__k")))
        .select(col("key"),
          (col("ts") + make_dt_interval(col("__k") * lit(35L))).as("ts"),
          col("v"))
      val small0 = base.filter(
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
        .limit(500).localCheckpoint()
      // A/B control: an IDENTICALLY AGED throwaway table with history
      // OFF (config lever) runs the same micro-inserts — the delta vs
      // small_insert_med below isolates the per-commit history price
      // from the age-dependent insert cost both tables share
      val dbOff = new graft.core.ChronoDB(spark,
        graft.core.ChronoConfig(
          java.nio.file.Files.createTempDirectory("histoff").toString,
          bucket = "day", history = false))
      val offMed = try {
        dbOff.createTable("ev", schema)
        dbOff.insertFrame("ev", aged)
        val secs = (1 to 10).map(_ =>
          timed(dbOff.insertFrame("ev", small0))._2)
        secs.sorted.apply(secs.size / 2)
      } finally dbOff.close()
      db.createTable("ev", schema)
      val (_, insertSec) = timed(db.insertFrame("ev", aged))   // v1
      val rows = db.table("ev").count()
      val buckets = graft.sources.ChronoLayout
        .listEntries(java.nio.file.Paths.get(root, "ev"))
        .map(_.bucket).distinct.size
      // per-commit overhead at this age: 10 one-bucket micro-inserts
      val small = base.filter(
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
        .limit(500).localCheckpoint()
      val smallSecs = (1 to 10).map(_ => timed(db.insertFrame("ev", small))._2)
      val smallMed = smallSecs.sorted.apply(smallSecs.size / 2)
      val preVer = db.history("ev").head.version               // v11
      val preRows = db.table("ev").count()
      val (headRows, snapHeadSec) =
        timed(db.tableAsOf("ev", preVer).count())
      val (deleted, deleteSec) = timed(db.deleteWhere("ev",
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-04 00:00:00"))))
      val postVer = db.history("ev").head.version
      // the SUPERSEDED snapshot still reads in full (grace retention)
      val (oldRows, snapOldSec) =
        timed(db.tableAsOf("ev", preVer).count())
      // change feed prices at the changed window, never the table
      val (feedRows, feedSec) =
        timed(db.changesBetween("ev", preVer, postVer).count())
      val hDir = java.nio.file.Paths.get(root, "ev", "_history")
      val (hFiles, hBytes) = {
        val st = java.nio.file.Files.list(hDir)
        try {
          import scala.jdk.CollectionConverters._
          val ps = st.iterator().asScala.toList
          (ps.size.toLong, ps.map(java.nio.file.Files.size).sum)
        } finally st.close()
      }
      val ok = headRows == preRows && oldRows == preRows &&
        feedRows == deleted && deleted > 0
      println(f"""{"probe":"history","mult":$mult,"rows":$rows,"buckets":$buckets,"insert_sec":$insertSec%.3f,"small_insert_med_sec":$smallMed%.3f,"small_insert_nohistory_med_sec":$offMed%.3f,"snapshot_head_sec":$snapHeadSec%.3f,"delete_sec":$deleteSec%.3f,"snapshot_old_sec":$snapOldSec%.3f,"feed_sec":$feedSec%.3f,"feed_rows":$feedRows,"deleted":$deleted,"history_files":$hFiles,"history_kb":${hBytes / 1024},"ok":$ok}""")
    } finally {
      db.close()
      spark.stop()
    }
  }

  private def dmlProbe(sfDir: String, mult: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("dmlprobe").toString
    val cat = s"dmlp${System.nanoTime() % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root)
    spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day"))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType)))
      db.createTable("ev", schema)
      val base = graft.core.Tables.t(spark, sfDir, "events")
        .select(col("user_id").cast("string").as("key"), col("ts"),
          col("event_id").cast("long").as("v"))
      // mult× the table AGE: each replica shifts ts by k·35 days (the
      // fixture spans ~30), so bucket count grows mult× while the
      // mutation window below stays the same 3 buckets
      val aged = base.crossJoin(
          spark.range(mult).select(col("id").as("__k")))
        .select(col("key"),
          (col("ts") + make_dt_interval(col("__k") * lit(35L))).as("ts"),
          col("v"))
      val (_, insertSec) = timed(db.insertFrame("ev", aged))
      val rows = db.table("ev").count()
      val buckets = graft.sources.ChronoLayout
        .listEntries(java.nio.file.Paths.get(root, "ev"))
        .map(_.bucket).distinct.size
      def fileSnapshot(excludeLo: String, excludeHi: String) =
        graft.sources.ChronoLayout
          .listEntries(java.nio.file.Paths.get(root, "ev"))
          .filterNot(e => e.bucket >= excludeLo && e.bucket <= excludeHi)
          .map(e => (e.bucket, e.file, e.size)).toSet
      // --- DELETE: 3 buckets (Jan 1-3 of the FIRST replica) ---
      val preDel = fileSnapshot("2024-01-01", "2024-01-03")
      val (deleted, deleteSec) = timed(db.deleteWhere("ev",
        col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-04 00:00:00"))))
      val delUntouched = fileSnapshot("2024-01-01", "2024-01-03") == preDel
      // --- UPDATE: the next 3 buckets ---
      val preUpd = fileSnapshot("2024-01-04", "2024-01-06")
      val (updated, updateSec) = timed(db.updateWhere("ev",
        Seq("v" -> (col("v") * lit(2L))),
        col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-04 00:00:00")) &&
          col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-07 00:00:00"))))
      val updUntouched = fileSnapshot("2024-01-04", "2024-01-06") == preUpd
      // --- MERGE (the full SQL stack): upsert a small change batch
      //     whose keys hit the NEXT 3 buckets ---
      spark.sql(s"SELECT key, ts, v FROM $cat.ev " +
        "WHERE ts >= TIMESTAMP '2024-01-07 00:00:00' " +
        "AND ts < TIMESTAMP '2024-01-10 00:00:00'")
        .groupBy("key").agg(max("ts").as("mts"), count(lit(1)).as("mn"))
        .createOrReplaceTempView("dml_changes")
      val preMrg = fileSnapshot("2024-01-07", "2024-01-09")
      // the catalog MERGE opens its own facade handle on this root —
      // release the probe's LOCK first (single-writer contract)
      db.close()
      // the ON clause carries the change batch's ts bounds — the CDC
      // best practice that lets the affected-bucket discovery PRUNE
      // (a bare key-equality merge must by definition look everywhere)
      val (merged, mergeSec) = timed(spark.sql(
        s"""MERGE INTO $cat.ev t USING dml_changes s
           |ON t.key = s.key AND t.ts = s.mts
           |  AND t.ts >= TIMESTAMP '2024-01-07 00:00:00'
           |  AND t.ts < TIMESTAMP '2024-01-10 00:00:00'
           |WHEN MATCHED THEN UPDATE SET v = t.v + s.mn
           |""".stripMargin).head().getLong(0))
      val mrgUntouched = fileSnapshot("2024-01-07", "2024-01-09") == preMrg
      val after = spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0)
      val rowsOk = after == rows - deleted
      val ok = delUntouched && updUntouched && mrgUntouched && rowsOk &&
        deleted > 0 && updated > 0 && merged > 0
      println(f"""{"probe":"dml","mult":$mult,"rows":$rows,"buckets":$buckets,"insert_sec":$insertSec%.3f,"deleted":$deleted,"delete_sec":$deleteSec%.3f,"updated":$updated,"update_sec":$updateSec%.3f,"merged":$merged,"merge_sec":$mergeSec%.3f,"untouched_outside_window":${delUntouched && updUntouched && mrgUntouched},"rows_ok":$rowsOk,"ok":$ok}""")
      if (!ok) sys.exit(1)
    } finally {
      db.close()
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.dataDir")
      spark.conf.unset(s"spark.sql.catalog.$cat.bucket")
      rmrf(root)
    }
  }

  /** Streaming-tail discovery cost at scale: the `format("chrono")`
    * SOURCE's per-trigger work is one manifest-fold diff — this probe
    * measures exactly that call ([[graft.sources.ChronoStreamSource]]
    * driven directly, no query-machinery noise) in the three states a
    * running tail alternates between: the FIRST offset (whole table =
    * one batch), the IDLE trigger (nothing new — the steady-state cost
    * a trigger loop pays forever), and the INCREMENTAL trigger (one
    * small batch landed). Run at 1× and 100×, the idle/incremental
    * numbers must be FLAT — discovery reads manifest KBs, never data
    * rows — which is what makes a 1-second trigger affordable on a
    * 100 TB table. */
  private def tailSourceProbe(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tail").toString
    val meta = java.nio.file.Files.createTempDirectory("tailmeta").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day"))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val ev = graft.core.Tables.t(spark, sfDir, "events")
        .select(col("user_id").cast("string").as("key"), col("ts"),
          encode(col("event_type"), "UTF-8").as("data"))
        .as[graft.core.ChronoRow]
      db.createTable("ev")
      db.insert("ev", ev)
      val rows = db.table("ev").count()
      val (cfs, evRoot) = graft.core.ChronoFs.resolve(
        root + "/ev", spark.sessionState.newHadoopConf())
      val src = new graft.sources.ChronoStreamSource(spark, cfs, evRoot,
        meta, "day")
      val (first, firstSec) = timed(src.getOffset)
      val (_, warmIdle) = timed(src.getOffset)
      val idleSecs = (1 to 5).map(_ => timed(src.getOffset)._2)
      // one tiny late batch lands → one incremental discovery
      db.insertSeq("ev", (0 until 100).map(i =>
        graft.core.ChronoRow(s"late$i",
          java.sql.Timestamp.valueOf("2024-01-31 23:00:00"),
          Array[Byte](1))))
      val (inc, incSec) = timed(src.getOffset)
      // the engine-facing batch carries isStreaming=true (the Source
      // contract) — outside a streaming query, count it by stripping
      // the flag off the relation
      val batchPlan = src.getBatch(first, inc.get)
        .queryExecution.logical.transform {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.copy(isStreaming = false)
        }
      val incBatchRows = org.apache.spark.sql.GraftColumnBridge
        .ofRows(spark, batchPlan).count()
      println(f"""{"probe":"tail_source","rows":$rows,"first_offset_sec":$firstSec%.4f,"idle_warm_sec":$warmIdle%.4f,"idle_min_sec":${idleSecs.min}%.4f,"idle_med_sec":${idleSecs.sorted.apply(2)}%.4f,"incremental_sec":$incSec%.4f,"incremental_rows":$incBatchRows}""")
    } finally {
      db.close()
      rmrf(root); rmrf(meta)
    }
  }

  /** Tail-source discovery vs TABLE AGE (VERDICT r15 Missing #3's
    * "done" probe): a table aged to `nBuckets` day-buckets, tailed with
    * and without the `watermarkBuckets` bound. Measured per mode: the
    * steady-state idle trigger (min/median of 5) and the incremental
    * trigger after one small recent batch, plus the in-memory seen-set
    * size. Run at two ages (e.g. 300 and 3000): the WATERMARKED idle/
    * incremental numbers and state size must be FLAT in age — the
    * unbounded mode's linear growth is the measured cost the option
    * retires. */
  private def tailAgeProbe(nBuckets: Int, rowsPerBucket: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("tailage").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day", sketchLgK = 0,
        sketchCmsDepth = 0, sketchBloomKeys = 0, writersPerBucket = 1))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      // age the table: nBuckets day-buckets in bounded-size inserts
      // (each insert appends one manifest fragment; the fold keeps the
      // read amortized, as in production)
      val baseUs = 1104537600000000L // 2005-01-01, room for 7000+ days
      db.createTable("ev")
      val step = math.max(1, nBuckets / 8)
      (0 until nBuckets by step).foreach { lo =>
        val hi = math.min(lo + step, nBuckets)
        db.insert("ev", spark.range(lo.toLong * rowsPerBucket,
            hi.toLong * rowsPerBucket)
          .select(concat(lit("k"), col("id") % 1000).as("key"),
            timestamp_micros(lit(baseUs) +
              expr(s"id div $rowsPerBucket") * lit(86400000000L)).as("ts"),
            encode(lit("x"), "UTF-8").as("data"))
          .as[graft.core.ChronoRow])
      }
      val (cfs, evRoot) = graft.core.ChronoFs.resolve(
        s"$root/ev", spark.sessionState.newHadoopConf())
      def measure(wm: Option[Int]): (Double, Double, Double, Int) = {
        val meta = java.nio.file.Files.createTempDirectory("tailagemeta")
        val src = new graft.sources.ChronoStreamSource(spark, cfs, evRoot,
          meta.toString, "day", wm)
        src.getOffset // first discovery (reads everything once)
        val idle = (1 to 5).map(_ => timed(src.getOffset)._2)
        // one small batch into the NEWEST bucket → incremental trigger
        db.insert("ev", spark.range(100)
          .select(concat(lit("late"), col("id")).as("key"),
            timestamp_micros(lit(baseUs) +
              lit((nBuckets - 1).toLong) * lit(86400000000L)).as("ts"),
            encode(lit("y"), "UTF-8").as("data"))
          .as[graft.core.ChronoRow])
        val (_, incSec) = timed(src.getOffset)
        val seenSize = src.seenSize
        rmrf(meta.toString)
        (idle.min, idle.sorted.apply(2), incSec, seenSize)
      }
      val (ubMin, ubMed, ubInc, ubSeen) = measure(None)
      val (wmMin, wmMed, wmInc, wmSeen) = measure(Some(7))
      println(f"""{"probe":"tail_age","n_buckets":$nBuckets,"rows":${nBuckets.toLong * rowsPerBucket},"unbounded_idle_min_sec":$ubMin%.4f,"unbounded_idle_med_sec":$ubMed%.4f,"unbounded_inc_sec":$ubInc%.4f,"unbounded_seen":$ubSeen,"wm7_idle_min_sec":$wmMin%.4f,"wm7_idle_med_sec":$wmMed%.4f,"wm7_inc_sec":$wmInc%.4f,"wm7_seen":$wmSeen}""")
    } finally {
      db.close()
      rmrf(root)
    }
  }

  /** Catalog-path scan planning vs TABLE AGE (r16): a `nBuckets`-day
    * table queried through the V2 TableCatalog with a 5-bucket ts
    * range. The lazy [[graft.sources.ChronoPartitionIndex]] must keep
    * the PRUNED query's cost flat in bucket count (label pruning first,
    * survivors' entries fetched via a pushed bucket-IN sidecar read) —
    * run at two ages and compare `pruned_sec`; `full_sec` (a count over
    * everything) legitimately grows with data. Also reports the exact
    * files scanned by the pruned query (must equal 5 × files/bucket). */
  private def catalogScanProbe(nBuckets: Int, rowsPerBucket: Int): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("catscan").toString
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(root, bucket = "day", sketchLgK = 0,
        sketchCmsDepth = 0, sketchBloomKeys = 0, writersPerBucket = 1))
    try {
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val baseUs = 1104537600000000L // 2005-01-01
      db.createTable("ev")
      val step = math.max(1, nBuckets / 8)
      (0 until nBuckets by step).foreach { lo =>
        val hi = math.min(lo + step, nBuckets)
        db.insert("ev", spark.range(lo.toLong * rowsPerBucket,
            hi.toLong * rowsPerBucket)
          .select(concat(lit("k"), col("id") % 1000).as("key"),
            timestamp_micros(lit(baseUs) +
              expr(s"id div $rowsPerBucket") * lit(86400000000L)).as("ts"),
            encode(lit("x"), "UTF-8").as("data"))
          .as[graft.core.ChronoRow])
      }
      val cat = s"catscan${nBuckets}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.ChronoCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.dataDir", root)
      spark.conf.set(s"spark.sql.catalog.$cat.bucket", "day")
      // pruned: 5 buckets in the middle (warm once, then best-of-3 —
      // each run re-resolves the relation, so PLANNING is in the time)
      val lo = "2005-03-01 00:00:00"
      val hi = "2005-03-05 23:59:59"
      def pruned() = spark.sql(
        s"""SELECT count(*) AS n FROM $cat.ev
           |WHERE ts BETWEEN TIMESTAMP '$lo' AND TIMESTAMP '$hi'""".stripMargin)
      pruned().collect()
      val prunedRuns = (1 to 3).map { _ =>
        val q = pruned()
        val (_, s) = timed(q.collect())
        (s, graft.core.PlanMetrics.scannedFiles(q.queryExecution.executedPlan))
      }
      val (_, fullSec) = timed(
        spark.sql(s"SELECT count(*) FROM $cat.ev").collect())
      println(f"""{"probe":"catalog_scan","n_buckets":$nBuckets,"rows":${nBuckets.toLong * rowsPerBucket},"pruned_min_sec":${prunedRuns.map(_._1).min}%.4f,"pruned_med_sec":${prunedRuns.map(_._1).sorted.apply(1)}%.4f,"pruned_files":${prunedRuns.head._2},"full_sec":$fullSec%.4f}""")
    } finally {
      db.close()
      rmrf(root)
    }
  }

  /** Adaptive-nprobe selection at derived scale (r14 VERDICT #4): the
    * near-uniform fixture geometry is the documented adversarial case
    * for probe-limited assignment (agreement 0.63 at the r14 point,
    * nothing escalating) — this probe measures
    * [[graft.operators.Dedup.adaptiveNprobe]] recovering the floor
    * there: selection cost (a handful of sample-sized assignments),
    * the chosen width, the FULL-corpus agreement that width actually
    * delivers, and the dedup wall-clock at it — so BASELINE.md can
    * state "the caveat is now a lever" with all four numbers on one
    * line. */
  private def semantic2AdaptiveProbe(sfDir: String, nlist: Int,
      ncoarse: Int, agreeFloor: Double, threshold: Double): Unit = {
    import org.apache.spark.sql.functions.{avg, col}
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val rows = emb.count()
      val fitBudget = 256L * nlist
      val fitDf =
        if (rows <= fitBudget) emb
        else emb.sample(withReplacement = false,
          fraction = math.min(1.0, fitBudget.toDouble / rows * 1.05),
          seed = 42L)
      val tFit0 = System.nanoTime()
      val fine = graft.operators.Dedup
        .fittedCentroids(fitDf, "vec_id", "embedding", nlist)
      val fitSec = (System.nanoTime() - tFit0) / 1e9
      // selection: sample ~1/64 of the corpus (at 2 M rows that is a
      // ~31 k-row ladder — each step prices one sample-sized two-level
      // assignment against a once-built flat reference)
      val tSel0 = System.nanoTime()
      val choice = graft.operators.Dedup.adaptiveNprobe(
        emb, "vec_id", "embedding", fine, ncoarse, agreeFloor,
        sampleMod = 64, startNprobe = 4)
      val selSec = (System.nanoTime() - tSel0) / 1e9
      // did the sample's promise hold? FULL-corpus agreement at the
      // chosen width vs the flat argmax over the same codebook
      // (SPARK_GRAFT_PROBE_AGREE=0 skips — it prices a full flat scan)
      val fullAgree =
        if (sys.env.get("SPARK_GRAFT_PROBE_AGREE").contains("0")) -1.0
        else {
          val flat = graft.operators.Dedup
            .assignFlat(emb, "vec_id", "embedding", fine)
            .withColumnRenamed("cell", "cf")
          graft.operators.Dedup
            .assignTwoLevel(emb, "vec_id", "embedding", fine, ncoarse,
              choice.nprobe)
            .join(flat, Seq("vec_id"))
            .agg(avg((col("cell") === col("cf")).cast("double")))
            .collect()(0).getDouble(0)
        }
      val t0 = System.nanoTime()
      val keepers = graft.operators.Dedup.semanticDedupTwoLevelOver(
          emb, "vec_id", "embedding", threshold, fine, ncoarse,
          choice.nprobe)
        .count()
      val dedupSec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"semantic_dedup_adaptive","nlist":$nlist,"ncoarse":$ncoarse,"floor":$agreeFloor,"rows":$rows,"fit_sec":$fitSec%.4f,"select_sec":$selSec%.4f,"chosen_nprobe":${choice.nprobe},"sample_agree":${choice.agreement}%.4f,"steps":${choice.steps},"full_agree":$fullAgree%.4f,"keepers":$keepers,"dedup_sec":$dedupSec%.4f}""")
    } finally spark.stop()
  }

  /** Skew-stress join probe (r12, VERDICT item 7): ONE deliberately hot
    * join key at derived scale, measured through the three defenses in
    * preference order. The derived events fact gets ~25% of its rows
    * remapped to a single user (hot_frac=0.5 — one key carries half the
    * fact), then joins a non-broadcastable per-user dim (broadcast
    * disabled to force the shuffle join a 100-TB dim would): (a) AQE
    * skew-join ON — the default guard; the probe reads the
    * AQEShuffleRead `numSkewedSplits` metric to prove the hot partition
    * actually split; (b) AQE skew-join OFF — the straggler baseline the
    * guard exists for; (c) Skew.saltedJoin — the no-AQE fallback for
    * pipelines that must preserve partitioning. The AQE skew thresholds
    * are scaled to the fixture (32 MB where the cluster default is
    * 256 MB): at 100 TB the hot partition crosses the DEFAULT threshold
    * naturally, and what is under test is the MECHANISM engaging, not
    * the threshold constant. One JSON line with all three wall-clocks
    * and the split count. */
  /** d35 substring-span-removal scaling: runs
    * [[graft.operators.Dedup.substringDedup]] over a documents fixture
    * and reports corpus size, dup-span mass, and wall time. The derived
    * fixtures word-scramble replicas >0, so the duplicated-span mass
    * stays roughly constant while the corpus grows k× — exactly the
    * production shape (rare boilerplate in a huge corpus), which makes
    * the probe measure the gram-shuffle cost, the term that dominates
    * at 100 TB. */
  private def substrProbe(sfDir: String, w: Int, hashGrams: Boolean): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spill = withSpill(spark)
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val rows = docs.count()
      def once(): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val agg = graft.operators.Dedup
          .substringDedup(docs, "doc_id", "text", w, hashGrams)
          .agg(sum(col("n_removed")).as("removed"),
            sum((col("n_removed") > 0).cast("long")).as("docs_hit"))
          .collect()(0)
        (agg.getLong(0), agg.getLong(1), (System.nanoTime() - t0) / 1e9)
      }
      val (_, _, warm) = once()
      val runs = Seq.fill(probeRuns)(once())
      val (removed, docsHit) = (runs.head._1, runs.head._2)
      val minSec = runs.map(_._3).min
      println(f"""{"probe":"substring_dedup","w":$w,"hash_grams":$hashGrams,"rows":$rows,"tokens_removed":$removed,"docs_hit":$docsHit,${spill.json}"warm_sec":$warm%.4f,"min_sec":$minSec%.4f,"timed_runs":$probeRuns}""")
    } finally spark.stop()
  }

  /** d2's MinHash-LSH near-dup recipe (the DECLARED query builder, via
    * the registry — the probe measures exactly what the hash gate
    * gates) timed at derived scale with spill metrics: the
    * memory-pressure proof runs this under a deliberately small heap
    * (SPARK_DRIVER_MEM) to demonstrate the Tungsten spill path carries
    * the third-decade corpus instead of OOMing. */
  private def neardupProbe(sfDir: String): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spill = withSpill(spark)
    try {
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries("d2_minhash_neardup")(spark, sfDir)
          .count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val (_, warm) = once()
      val runs = Seq.fill(probeRuns)(once())
      val minSec = runs.map(_._2).min
      println(f"""{"probe":"minhash_neardup","pairs":${runs.head._1},${spill.json}"warm_sec":$warm%.4f,"min_sec":$minSec%.4f,"timed_runs":$probeRuns}""")
    } finally spark.stop()
  }

  /** Z-order layout payoff, measured: writes the SAME events corpus two
    * ways — time-clustered (the engine's default (ts, key) order) and
    * Z-ordered on (user_id, ts_us) via Layout.zOrderBy with
    * repartitionByRange so each FILE covers a small hyper-rectangle —
    * then times an identical 2-D predicate (a 10-day ts window × a
    * narrow user band) against both. The time-clustered layout prunes
    * ts only and decodes every user in the window; the Z-ordered one
    * gives parquet row-group/file min-max stats that are tight in BOTH
    * dimensions, so the pushed predicates skip most of the window.
    * This is the measurement behind d15's key: the layout is the
    * operator. */
  private def zorderProbe(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("zprobe").toString
    try {
      val ev = graft.core.Tables.normTs(
          spark.read.parquet(s"$sfDir/events.parquet"))
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      val (uMin, uMax, tMin, tMax) = {
        val r = ev.agg(min("user_id"), max("user_id"),
          min("ts_us"), max("ts_us")).collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
      val rows = ev.count()
      // time-clustered: the default ingest layout (range-split by ts)
      ev.repartitionByRange(32, col("ts_us"))
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite").parquet(s"$base/linear")
      // z-ordered on (user, time)
      graft.operators.Layout.zOrderBy(ev, "user_id", uMin, uMax,
          "ts_us", tMin, tMax, bits = 16)
        .repartitionByRange(32, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(s"$base/zorder")
      // 2-D predicate: a wide 10-day ts window × a ~2% user band — the
      // shape time clustering alone cannot prune in the user dimension
      val tLo = tMin + (tMax - tMin) / 3
      val tHi = tLo + 10L * 86400000000L
      // a ~2%-of-rows user band by rank (derived corpora stride the
      // user space, so a band by VALUE can land in a gap)
      val (uLo, uHi) = {
        val r = ev.agg(
          expr("percentile_approx(user_id, 0.50, 10000)"),
          expr("percentile_approx(user_id, 0.52, 10000)")).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      // (match_rows, decoded_rows, sec): decoded_rows is the scan
      // node's numOutputRows — rows the parquet reader actually
      // materialized after row-group min-max skipping, the cost the
      // layout controls (wall time hides it when the corpus is
      // page-cache-resident on local[32])
      def timed(path: String): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val q = spark.read.parquet(path)
          .filter(col("ts_us") >= tLo && col("ts_us") <= tHi &&
            col("user_id") >= uLo && col("user_id") <= uHi)
          .agg(count(lit(1)), sum(col("value")))
        val n = q.collect()(0).getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        // dig through AQE wrappers and materialized query stages to the
        // parquet scans — their numOutputRows is the decode count after
        // row-group min-max skipping
        def scanRows(p: org.apache.spark.sql.execution.SparkPlan): Long =
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              scanRows(a.executedPlan)
            case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              scanRows(s.plan)
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
            case other => other.children.map(scanRows).sum
          }
        val decoded = scanRows(q.queryExecution.executedPlan)
        (n, decoded, sec)
      }
      timed(s"$base/linear"); timed(s"$base/zorder") // warm both
      val lin = Seq.fill(probeRuns)(timed(s"$base/linear"))
      val zor = Seq.fill(probeRuns)(timed(s"$base/zorder"))
      require(lin.head._1 == zor.head._1,
        s"layouts must agree on the result: ${lin.head._1} vs ${zor.head._1}")
      println(f"""{"probe":"zorder_layout","rows":$rows,"match_rows":${lin.head._1},"linear_decoded":${lin.head._2},"zorder_decoded":${zor.head._2},"linear_min_sec":${lin.map(_._3).min}%.4f,"zorder_min_sec":${zor.map(_._3).min}%.4f,"timed_runs":$probeRuns}""")
    } finally { rmrf(base); spark.stop() }
  }

  /** d35 hot-gram stress: EVERY document gets the same 8-token header
    * (universal boilerplate — both the operator's worst skew case and
    * its actual production use case). The distinct-doc count for the
    * hot gram funnels |docs| rows into one reducer group; this measures
    * that straggler (8-byte hashed keys, so the hot group is ~8·n bytes,
    * not strings) and asserts the header is removed from every doc. */
  private def skewSubstrProbe(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val header = "common site header terms of service all rights reserved"
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("text", concat(lit(header + " "), col("text")))
      val rows = docs.count()
      def once(): (Long, Double) = {
        val t0 = System.nanoTime()
        val hit = graft.operators.Dedup
          .substringDedup(docs, "doc_id", "text", 8, hashGrams = true)
          .filter(col("n_removed") >= 8).count()
        (hit, (System.nanoTime() - t0) / 1e9)
      }
      val (_, warm) = once()
      val runs = Seq.fill(probeRuns)(once())
      val hit = runs.head._1
      require(hit == rows,
        s"universal header must be removed from every doc: $hit of $rows")
      val minSec = runs.map(_._2).min
      println(f"""{"probe":"skew_substr","rows":$rows,"docs_cleaned":$hit,"warm_sec":$warm%.4f,"min_sec":$minSec%.4f,"timed_runs":$probeRuns}""")
    } finally spark.stop()
  }

  private def skewJoinProbe(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dimDir = java.nio.file.Files.createTempDirectory("skew_dim").toString
    try {
      val ev0 = graft.core.Tables.normTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      // hot key: every 2nd row lands on user -7 (deterministic)
      val ev = ev0.withColumn("user_id",
        when(pmod(xxhash64(col("event_id")), lit(2)) === 0, lit(-7L))
          .otherwise(col("user_id")))
        .select(col("user_id"), col("event_type"), col("value"))
        .persist()
      val rows = ev.count()
      // dim goes to parquet and back: a PERSISTED dim would arrive at
      // the join pre-partitioned from its own build (no shuffle stage
      // on that side), and OptimizeSkewedJoin can only split when BOTH
      // sides are shuffle reads it can re-slice/replicate
      ev.select(col("user_id")).distinct()
        .withColumn("w", pmod(xxhash64(col("user_id")), lit(97)).cast("double"))
        .write.mode("overwrite").parquet(s"$dimDir/dim")
      val dim = spark.read.parquet(s"$dimDir/dim")
      val dimRows = dim.count()
      def shape(joined: org.apache.spark.sql.DataFrame) = joined
        .groupBy(col("event_type"))
        .agg(sum(col("value") * col("w")).as("wv"), count(lit(1)).as("n"))
      def time3(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
        var skewSplits = 0L
        mk().collect() // warm
        val t = Seq.fill(3) {
          val t0 = System.nanoTime()
          val df = mk()
          df.collect()
          skewSplits = collectMetric(df.queryExecution.executedPlan,
            "numSkewedSplits")
          (System.nanoTime() - t0) / 1e9
        }.min
        (t, skewSplits)
      }
      val (aqeOn, splitsOn) =
        time3(() => shape(ev.join(dim, Seq("user_id"))))
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (aqeOff, _) =
        time3(() => shape(ev.join(dim, Seq("user_id"))))
      val (salted, _) =
        time3(() => shape(graft.operators.Skew.saltedJoin(ev, dim, "user_id")))
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      println(f"""{"probe":"skew_join","rows":$rows,"dim_rows":$dimRows,"hot_frac":0.5,"aqe_skew_sec":$aqeOn%.3f,"aqe_skew_splits":$splitsOn,"no_guard_sec":$aqeOff%.3f,"salted_sec":$salted%.3f}""")
    } finally { rmrf(dimDir); spark.stop() }
  }

  /** Sum a named SQLMetric over the executed plan, unwrapping the AQE
    * leaf wrappers (PlanMetrics pattern). */
  private def collectMetric(
      p: org.apache.spark.sql.execution.SparkPlan, name: String): Long = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    p match {
      case a: AdaptiveSparkPlanExec => collectMetric(a.executedPlan, name)
      case q: QueryStageExec => collectMetric(q.plan, name)
      case r: ReusedExchangeExec => collectMetric(r.child, name)
      case other =>
        val own = other.metrics.get(name).map(_.value).getOrElse(0L)
        own + other.children.map(collectMetric(_, name)).sum
    }
  }

  /** Hot-LSH-bucket stress (r12, VERDICT item 7): 20k documents with
    * IDENTICAL text join the derived corpus — every band maps them to
    * ONE bucket, where uncapped pairing would emit
    * bands × C(20k, 2) ≈ 3.2e9 verify pairs from single tasks. The
    * maxBucket chain+anchor cap bounds the hot bucket to linear pair
    * mass (≈ members × (chainWidth + 1) per band) while keeping the
    * duplicate CLASS connected through the anchor, so the dedup result
    * is unchanged where it matters: the probe asserts every hot doc
    * still pairs (transitively) with the class representative. One JSON
    * line: wall-clock, verified-pair count, and the capped-vs-uncapped
    * pair-mass arithmetic from lshBucketStats. */
  private def skewLshProbe(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val base = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1
      val hotN = 20000
      val hot = spark.range(hotN).select(
        (col("id") + base).as("doc_id"),
        lit("the one hot duplicate document that floods a single " +
          "minhash bucket with identical shingle sets").as("text"))
      val corpus = docs.unionByName(hot).persist()
      val rows = corpus.count()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.minHashLsh(corpus, "doc_id", "text",
        shingleK = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .persist()
      val nPairs = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // connectivity: every hot doc reachable from the class anchor —
      // with identical texts the anchor rule guarantees a direct pair
      // to the bucket's first member, so the hot class collapses to one
      // component; count hot ids that appear in ANY >=0.99 pair
      val hotIds = pairs.filter(col("jaccard") >= 0.99)
        .select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .filter(col("id") >= base).distinct().count()
      val stats = graft.operators.Dedup.lshBucketStats(
        graft.operators.Dedup.bandBuckets(corpus, "doc_id", "text",
          shingleK = 3, bands = 16, rowsPerBand = 4),
        maxBucket = 1024)
        .agg(max(col("size")).as("max_members"),
          sum(col("pairs_emitted")).as("pairs_emitted"),
          sum(col("pairs_uncapped")).as("pairs_uncapped"))
        .collect()(0)
      println(f"""{"probe":"skew_lsh","rows":$rows,"hot_docs":$hotN,"lsh_sec":$sec%.3f,"verified_pairs":$nPairs,"hot_connected":${hotIds == hotN},"max_bucket_members":${stats.getLong(0)},"pair_mass_emitted":${stats.getLong(1)},"pair_mass_uncapped":${stats.getLong(2)}}""")
    } finally spark.stop()
  }

  /** Bucketed-layout payoff at derived scale: the same fact-fact join +
    * aggregation over (a) plain parquet (two join exchanges every query)
    * and (b) bucketed tables co-located on the join key (zero join
    * exchanges — the write pays the shuffle ONCE). BucketingSpec pins
    * the plan property at fixture scale; this measures the wall-clock
    * gap where the exchange actually costs something. */
  private def bucketJoinProbe(sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("bj_wh").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      def shape(l: org.apache.spark.sql.DataFrame,
          o: org.apache.spark.sql.DataFrame) =
        l.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_quantity")).as("q"))
      def time3(mk: () => org.apache.spark.sql.DataFrame): Double = {
        mk().collect() // warm
        Seq.fill(3) {
          val t0 = System.nanoTime()
          mk().collect()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val direct = time3(() => shape(li, ord))
      val tw0 = System.nanoTime()
      li.write.bucketBy(32, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
      ord.write.bucketBy(32, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_b")
      val writeSec = (System.nanoTime() - tw0) / 1e9
      val bucketed = time3(() =>
        shape(spark.table("li_b"), spark.table("ord_b")))
      println(f"""{"probe":"bucket_join","rows":${li.count()},"direct_min_sec":$direct%.3f,"bucketed_min_sec":$bucketed%.3f,"bucket_write_sec":$writeSec%.2f}""")
    } finally { rmrf(wh); spark.stop() }
  }

  /** Per-bucket key-envelope delete at derived scale (r12, VERDICT item
    * 6 measured): a 10 M-row table with day buckets and DAY-PREFIXED
    * keys (`d<DD>/u<user>` — each bucket's [key_min, key_max] envelope
    * covers exactly its own day's prefix), then ONE erasure batch of
    * every key from days 05–07 PLUS one stray high key ("zzz…") — the
    * r11 worst case: the stray inflates the GLOBAL envelope to cover
    * every bucket, so the pre-r12 prune would scan all 30; the
    * per-bucket check must touch only the 3 clustered days. Reports
    * wall-clock, rows deleted, and buckets rewritten (mtime evidence,
    * not a claim). */
  private def envDeleteProbe(sfDir: String): Unit = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    try {
      val root = java.nio.file.Files
        .createTempDirectory("envdel_probe").toString
      val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day"))
      try {
        db.createTable("ev")
        val ev = graft.core.Tables.normTs(
            spark.read.parquet(s"$sfDir/events.parquet"))
          .select(concat(lit("d"), date_format(col("ts"), "dd"), lit("/u"),
              col("user_id").cast("string")).as("key"),
            col("ts"), encode(col("event_type"), "UTF-8").as("data"))
        db.insert("ev", ev.as[ChronoRow])
        val total = ev.count()
        val tdir = java.nio.file.Paths.get(root, "ev")
        def mtimes(): Map[String, Long] = {
          val s = java.nio.file.Files.walk(tdir)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala
              .filter(_.toString.endsWith(".parquet"))
              .map(p => p.toString ->
                java.nio.file.Files.getLastModifiedTime(p).toMillis)
              .toMap
          } finally s.close()
        }
        val before = mtimes()
        val bucketsTotal = java.nio.file.Files.list(tdir).count()
        val doomed = ev.filter(col("key") < lit("d08"))
          .filter(col("key") >= lit("d05"))
          .select(col("key")).distinct()
          .unionByName(Seq("zzz_stray_key").toDF("key"))
        val batchKeys = doomed.count()
        val t0 = System.nanoTime()
        val deleted = db.deleteMatching("ev", doomed)
        val sec = (System.nanoTime() - t0) / 1e9
        val after = mtimes()
        def bucketOf(p: String): Option[String] =
          "bucket=([0-9-]+)".r.findFirstMatchIn(p).map(_.group(1))
        // a fully-doomed bucket is DROPPED (dir gone), a partly-doomed
        // one is rewritten (new file mtimes); both count as touched
        // rewrites land as NEW part files, so count both new paths and
        // changed mtimes; a dropped bucket is one with no files left
        val afterBuckets = after.keySet.flatMap(bucketOf)
        val dropped = before.keySet.diff(after.keySet).flatMap(bucketOf)
          .diff(afterBuckets)
        val rewritten = (after.keySet.diff(before.keySet).flatMap(bucketOf) ++
          after.filter { case (p, m) => before.contains(p) && before(p) != m }
            .keys.flatMap(bucketOf)).toSet
        val touched = (dropped ++ rewritten).toSeq.sorted
        println(f"""{"probe":"env_delete","rows":$total,"batch_keys":$batchKeys,"deleted":$deleted,"delete_sec":$sec%.2f,"buckets_total":$bucketsTotal,"buckets_dropped":${dropped.size},"buckets_rewritten":${rewritten.size},"touched":"${touched.mkString(",")}"}""")
      } finally { db.close(); rmrf(root) }
    } finally spark.stop()
  }

  private def upsertProbe(sfDir: String, keyCol: String): Unit = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    try {
      val root = java.nio.file.Files.createTempDirectory("upsert_probe").toString
      val db = new ChronoDB(spark, ChronoConfig(root, bucket = "day"))
      try {
        db.createTable("st")
        val ev = graft.core.Tables.normTs(
            spark.read.parquet(s"$sfDir/events.parquet"))
          .select(col(keyCol).cast("string").as("key"), col("ts"),
            encode(col("event_type"), "UTF-8").as("data"))
        val split = lit("2024-01-25 00:00:00").cast("timestamp")
        val t0 = System.nanoTime()
        db.insert("st", ev.filter(col("ts") < split).as[ChronoRow])
        val t1 = System.nanoTime()
        val batch = ev.filter(col("ts") >= split)
        val batchRows = batch.count()
        val keys = batch.select(col("key")).distinct().count()
        val t2 = System.nanoTime()
        val removed = db.upsert("st", batch.as[ChronoRow])
        val t3 = System.nanoTime()
        val base = ev.filter(col("ts") < split).count()
        println(f"""{"probe":"upsert","base_rows":$base,"batch_rows":$batchRows,"batch_keys":$keys,"removed":$removed,"insert_sec":${(t1 - t0) / 1e9}%.2f,"upsert_sec":${(t3 - t2) / 1e9}%.2f}""")
      } finally { db.close(); rmrf(root) }
    } finally spark.stop()
  }
}
