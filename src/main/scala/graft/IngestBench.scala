package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{ChronoConfig, ChronoDB, ChronoRow, Tables}

/** Write-path benchmark: the reference's identity is an ingest engine
  * (ChronoBase table.go:78-119 memtable/flush), so the batch insert path
  * (ChronoDB.insert — salted writers + HLL + CMS sidecars) and the
  * streaming micro-batch loop (Streams.chronoSink) get first-class
  * timings beside the query section.
  *
  * Protocol: the source rows are cached and counted up front (read cost
  * excluded — this times the WRITE path), then the timed inserts run as
  * three INTERLEAVED rounds — every config once per round, fixed
  * rotation, fresh table dir each insert — after shared warm-ups.
  * Sidecar overhead = median over rounds of the round-paired ratio
  * (on_i − off_i)/off_i, the number that decides whether per-batch
  * stats are affordable at production ingest rates; pairing adjacent
  * runs cancels host-load drift that a per-config-block protocol lets
  * land on one config (the r11 1404%-overhead artifact).
  *
  * The overhead is measured at TWO batch sizes: the fixture's 100k-row
  * batch and the same fixture replicated `SPARK_GRAFT_INGEST_MULT`×
  * (default 6× ≈ 600k rows, distinct keys per replica), in THREE
  * configs: full sketches (HLL+CMS+Bloom), bloom-only (the cheapest
  * useful index — Bloom + key min/max + n), and none (every sketch
  * knob zeroed, so the observe/BucketStatsAgg path truly does not
  * run — the r8 artifact's control left Bloom on and read ~0%). The
  * sidecar build PIGGYBACKS on the data-write job (Dataset.observe +
  * BucketStatsAgg — the write tasks fold per-bucket HLL/n/CMS state as
  * rows stream by, and the sidecar file write is a driver-local
  * KB-scale append). Measured against the corrected control (load ~2):
  * full family ~30-40% at 100k rows falling to ~1-10% at 600k (the
  * cost is dominated by a fixed per-batch floor that amortizes with
  * batch size), bloom-only ~20% at 100k — against 50-75% for the
  * earlier shape that re-scanned the batch in a dedicated sidecar
  * job. Raw per-config seconds are emitted so the analysis can be
  * re-done from the artifact.
  *
  * Timing hygiene: the first-ever insert through a fresh JVM pays
  * JIT/codegen warm-up for the whole write+observe path (measured ~2×
  * its warm cost), so BOTH configs get cross-warmed at the small size
  * before any timed run — otherwise the first-timed config (sketches)
  * foots the global bill and the overhead ratio reads high.
  *
  * Bucket granularity is DAY here: at sf0.1 the events fixture spans 720
  * hours, and hour-granularity would make the 100k-row benchmark a
  * small-file filesystem test (139 rows/bucket) instead of a write-path
  * test. Day buckets (30 dirs, ~3.3k rows each) keep the salted-writer
  * fan-out real without drowning the signal in directory churn.
  *
  * The streaming loop (4 staged micro-batches through chronoSink with
  * two inline compact+cleanup passes) reports a per-phase breakdown via
  * Streams.SinkMetrics: foreachBatch insert seconds vs maintenance
  * seconds vs everything else (micro-batch planning, offset commits,
  * stream startup) — so a regression in the insert path can't hide
  * inside harness noise, and the batch-vs-sink throughput gap is
  * attributable from the artifact alone. A second sink point runs the
  * SAME rows as one micro-batch: each micro-batch pays a fixed floor
  * (one write job + one sidecar append + checkpoint commits), so
  * sink throughput is a function of batch size, and the one-batch
  * figure is the one that should approach the batch-insert rate.
  */
object IngestBench {

  /** Returns (full, compact) JSON object strings (no trailing newline)
    * with the ingest timings, e.g. {"rows":100000,"insert_sec":...}.
    * `full` carries every raw array and breakdown (written to
    * BENCH_DETAIL.json); `compact` carries the headline rates and
    * overhead percentages only — it must fit, with the query section,
    * inside the driver's 2000-char output-tail capture window. */
  def run(spark: SparkSession, sfDir: String): (String, String) = {
    import spark.implicits._

    // (key, ts, data) rows from the events fixture: key = user id,
    // payload = the props JSON bytes. event_id rides along only to split
    // deterministic micro-batches for the sink loop.
    val base = Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id").cast("string").as("key"),
        col("ts"), encode(col("props"), "UTF-8").as("data"))
      .persist()
    val n = base.count()
    val rows = base.select(col("key"), col("ts"), col("data")).as[ChronoRow]

    // the large-batch point: the same fixture replicated mult× with
    // per-replica key suffixes (distinct keys — the sketches must not
    // get a free ride from replica-identical hashing) and unchanged
    // timestamps (same bucket structure, so the two points differ in
    // batch SIZE, not in layout shape)
    val mult = sys.env.getOrElse("SPARK_GRAFT_INGEST_MULT", "6").toInt
    val big = base
      .crossJoin(broadcast(spark.range(mult).select(col("id").as("__rep"))))
      .select(concat_ws("_", col("key"), col("__rep")).as("key"),
        col("ts"), col("data"))
      .persist()
    val nBig = big.count()
    val bigRows = big.as[ChronoRow]

    def freshDir(): Path = Files.createTempDirectory("ingest_bench")
    def rmr(p: Path): Unit = {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }
    // Three measured configs. "none" must zero EVERY sketch knob:
    // sketchBloomKeys left at its 4096 default keeps ChronoDB.sketching
    // true, so the "control" still runs the observe/BucketStatsAgg path
    // and writes sidecars — the overhead ratio then compares sketch-on
    // vs sketch-mostly-on and reads ~0 (the BENCH_r08 artifact did
    // exactly this). "bloom" isolates the cheapest useful index (key
    // Bloom + min/max + n, no HLL/CMS) as its own point.
    // "rollup" isolates the _rollup continuous aggregate on its own
    // (every sketch knob zeroed): its per-(bucket, slot) states ride
    // the same observe pass, so its marginal cost over "none" is the
    // price of a continuous aggregate at ingest.
    // "bloom" IS ChronoConfig.smallBatch — the shipped small-batch
    // preset is the thing being measured, not a bench-local config.
    def cfg(dir: Path, mode: String): ChronoConfig = mode match {
      // the overhead A/B isolates SKETCH knobs, so the writer fan-out is
      // pinned to the control's 4 (r15: smallBatch itself now ships
      // writersPerBucket=1 — comparing that directly against the wpb=4
      // control would conflate file-count savings with sketch cost)
      case "bloom" => ChronoConfig.smallBatch(dir.toString, bucket = "day")
        .copy(writersPerBucket = 4)
      case "full"  => ChronoConfig.fullStats(dir.toString, bucket = "day")
      case _ =>
        ChronoConfig(dir.toString, bucket = "day",
          sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0L,
          rollupValue = if (mode == "rollup") Some("length(data)") else None)
    }

    def oneInsert(data: org.apache.spark.sql.Dataset[ChronoRow],
        mode: String): Double = {
      val dir = freshDir()
      val db = new ChronoDB(spark, cfg(dir, mode))
      try {
        db.createTable("events")
        val t0 = System.nanoTime()
        db.insert("events", data)
        (System.nanoTime() - t0) / 1e9
      } finally { db.close(); rmr(dir) }
    }

    // cross-config warm-up (see scaladoc: JIT hygiene)
    (1 to 2).foreach { _ =>
      oneInsert(rows, "full"); oneInsert(rows, "none")
    }

    // INTERLEAVED A/B rounds (r12 protocol): each of the 3 timed rounds
    // runs every config once, in a fixed rotation, instead of 3-blocks
    // per config. Host-load drift over the ~minute the section takes
    // then lands evenly across configs and cancels in the overhead
    // RATIO — the r11 committed artifact read 1404% large-batch
    // overhead purely because a load spike sat on the sketches-on
    // block while the control ran quiet (idle re-runs measured ~10%).
    // Round-paired percentages make that robustness explicit: round i's
    // on/off inserts ran adjacent in time, so (on_i − off_i)/off_i is a
    // drift-free sample and the reported overhead is its median, with
    // the run order and a stderr in the artifact for re-analysis.
    def interleaved(data: org.apache.spark.sql.Dataset[ChronoRow],
        modes: Seq[String]): Map[String, Seq[Double]] = {
      val acc = collection.mutable.Map.empty[String, Vector[Double]]
        .withDefault(_ => Vector.empty)
      (1 to 3).foreach { _ =>
        modes.foreach(m => acc(m) = acc(m) :+ oneInsert(data, m))
      }
      acc.toMap
    }
    val smallModes = Seq("full", "bloom", "rollup", "none")
    val smallRuns = interleaved(rows, smallModes)
    val (withSketch, bloomOnly, rollupOnly, noSketch) = (smallRuns("full"),
      smallRuns("bloom"), smallRuns("rollup"), smallRuns("none"))
    val bigModes = Seq("full", "none")
    val bigRuns = interleaved(bigRows, bigModes)
    val (withSketchBig, noSketchBig) = (bigRuns("full"), bigRuns("none"))

    // Streaming loop: 4 staged micro-batches (maxFilesPerTrigger=1)
    // through chronoSink with compactEvery=2, so the timing includes two
    // inline compact+cleanup maintenance passes — the closed ingest loop
    // a long-running deployment actually pays for. One timed run: this
    // is a throughput ballpark (rows/sec over 4 batches), not a
    // median-of-3 statistic, and is labeled as such by its single key.
    val landing = freshDir()
    (0 until 4).foreach { i =>
      base.filter(col("event_id") % 4 === i)
        .select(col("key"), col("ts"), col("data"))
        .coalesce(1).write.mode("overwrite").parquet(s"$landing/b$i")
      val part = new java.io.File(s"$landing/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, landing.resolve(f"batch$i%03d.parquet"))
      rmr(landing.resolve(s"b$i"))
    }
    def runSink(filesPerTrigger: Option[Int]):
        (Double, graft.streaming.Streams.SinkMetrics, Map[String, Long]) = {
      val sinkDir = freshDir()
      val cp = freshDir()
      // the sink loop IS the small-batch regime — it runs the SHIPPED
      // preset verbatim (bloom-only, one writer per bucket; r15 change —
      // earlier rounds ran 4 salted writers per bucket here, so sink_*
      // keys step faster from r15 on: the 4× file fan-out was pure
      // compaction fuel at micro-batch sizes, see smallBatch scaladoc)
      val sinkDb = new ChronoDB(spark,
        ChronoConfig.smallBatch(sinkDir.toString, bucket = "day"))
      val m = new graft.streaming.Streams.SinkMetrics
      val (sec, durations) =
        try {
          sinkDb.createTable("events")
          val base = spark.readStream
            .schema("key STRING, ts TIMESTAMP, data BINARY")
          val src = filesPerTrigger
            .fold(base)(n => base.option("maxFilesPerTrigger", n))
            .parquet(landing.toString)
          val t0 = System.nanoTime()
          val q = graft.streaming.Streams.chronoSink(src, sinkDb, "events",
            cp.toString, compactEvery = 2, trigger = Trigger.AvailableNow(),
            metrics = Some(m)).start()
          q.awaitTermination()
          val wall = (System.nanoTime() - t0) / 1e9
          // Spark's own per-trigger accounting (progress.durationMs:
          // addBatch = the foreachBatch call, walCommit/commitOffsets =
          // checkpoint writes, queryPlanning/getBatch/latestOffset =
          // micro-batch planning), summed over the run's triggers — the
          // decomposition that attributes the sink-vs-batch throughput
          // gap term by term (VERDICT r14 Missing #5)
          import scala.jdk.CollectionConverters._
          val durs = q.recentProgress.toSeq
            .flatMap(_.durationMs.asScala.map { case (k, v) => (k, v.toLong) })
            .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          (wall, durs)
        } finally { sinkDb.close(); rmr(sinkDir); rmr(cp) }
      (sec, m, durations)
    }
    // two sink points over the SAME staged landing: 4 micro-batches
    // (25k rows each — the per-batch floor charged 4×, plus two inline
    // maintenance passes) vs ONE micro-batch of the full 100k (floor
    // charged once). The spread between their foreachBatch-only rows/s
    // is the micro-batch floor made visible; the one-batch figure is
    // the one comparable to the batch-insert throughput above.
    val (sinkSec, sinkMetrics, sinkDurs) = runSink(Some(1))
    val (sink1Sec, sink1Metrics, sink1Durs) = runSink(None)
    rmr(landing)

    base.unpersist()
    big.unpersist()

    def med(xs: Seq[Double]): Double = xs.sorted.apply(1)
    // ROUND-PAIRED overhead (the r12 headline form): per-round ratio of
    // adjacent interleaved runs, then the median across rounds — load
    // drift common to a round cancels inside each sample
    def pairedPcts(on: Seq[Double], off: Seq[Double]): Seq[Double] =
      on.zip(off).map { case (a, b) => (a - b) / b * 100.0 }
    def pct(on: Seq[Double], off: Seq[Double]): Double =
      med(pairedPcts(on, off))
    def stderrOf(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      math.sqrt(xs.map(x => (x - m) * (x - m)).sum /
        (xs.size - 1).max(1) / xs.size)
    }
    // the pre-r12 form (ratio of per-config medians) stays in the full
    // artifact for round-over-round comparability
    def pctOfMedians(on: Seq[Double], off: Seq[Double]): Double =
      (med(on) - med(off)) / med(off) * 100.0
    // the min-of-3 overhead is the contention-robust reading (same
    // rationale as queries_min): on a loaded box the median of a
    // sub-second insert inflates by scheduling noise larger than the
    // sidecar work itself (observed 26% idle vs 63% at load ~4 for the
    // SAME build — raw arrays carry the evidence)
    def pctMin(on: Seq[Double], off: Seq[Double]): Double =
      (on.min - off.min) / off.min * 100.0
    def arr(xs: Seq[Double]): String = xs.mkString("[", ",", "]")
    // sink breakdown: insert = foreachBatch ChronoDB.insert wall-clock,
    // maint = inline compact+cleanup, harness = stream startup +
    // micro-batch planning + offset commits (total minus the other two)
    val sinkInsert = sinkMetrics.insertSec
    val sinkMaint = sinkMetrics.maintSec
    val sinkHarness = sinkSec - sinkInsert - sinkMaint
    // the per-micro-batch INSERT floor, from the two sink points over
    // identical total rows: 4 batches pay the write-job launch +
    // sidecar/manifest appends 4×, one batch pays them once — the
    // marginal cost of each extra micro-batch
    val sinkBatchFloor =
      (sinkInsert - sink1Metrics.insertSec) /
        (sinkMetrics.batches.get() - sink1Metrics.batches.get()).max(1)
    def dursJson(d: Map[String, Long]): String = d.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    def r2(x: Double): String = BigDecimal(x)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    def r4(x: Double): String = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val compact =
      s"""{"rows":$n,"insert_sec":${r4(med(withSketch))},""" +
      s""""insert_rows_per_sec":${r2(n / med(withSketch))},""" +
      s""""sidecar_overhead_pct":${r2(pct(withSketch, noSketch))},""" +
      s""""bloom_overhead_pct":${r2(pct(bloomOnly, noSketch))},""" +
      s""""rollup_overhead_pct":${r2(pct(rollupOnly, noSketch))},""" +
      s""""rows_large":$nBig,""" +
      s""""insert_large_rows_per_sec":${r2(nBig / med(withSketchBig))},""" +
      s""""sidecar_overhead_large_pct":${r2(pct(withSketchBig, noSketchBig))},""" +
      s""""sink_preset":"small_batch_bloom",""" +
      s""""sink_rows_per_sec":${r2(n / sinkSec)},""" +
      s""""sink_batch_floor_sec":${r4(sinkBatchFloor)},""" +
      s""""sink1_foreachbatch_rows_per_sec":${r2(n / sink1Metrics.insertSec)}}"""
    val full =
      s"""{"rows":$n,"insert_sec":${med(withSketch)},"insert_sec_min":${withSketch.min},""" +
      s""""insert_raw":${arr(withSketch)},"insert_rows_per_sec":${n / med(withSketch)},""" +
      s""""insert_nosketch_sec":${med(noSketch)},"insert_nosketch_raw":${arr(noSketch)},""" +
      s""""insert_bloom_sec":${med(bloomOnly)},"insert_bloom_raw":${arr(bloomOnly)},""" +
      s""""insert_rollup_sec":${med(rollupOnly)},"insert_rollup_raw":${arr(rollupOnly)},""" +
      s""""insert_order":${smallModes.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""rollup_overhead_pct":${pct(rollupOnly, noSketch)},""" +
      s""""sidecar_overhead_pct":${pct(withSketch, noSketch)},""" +
      s""""sidecar_overhead_paired_pcts":${arr(pairedPcts(withSketch, noSketch))},""" +
      s""""sidecar_overhead_paired_stderr_pct":${stderrOf(pairedPcts(withSketch, noSketch))},""" +
      s""""sidecar_overhead_median_form_pct":${pctOfMedians(withSketch, noSketch)},""" +
      s""""sidecar_overhead_min_pct":${pctMin(withSketch, noSketch)},""" +
      s""""bloom_overhead_pct":${pct(bloomOnly, noSketch)},""" +
      s""""rows_large":$nBig,"insert_large_sec":${med(withSketchBig)},""" +
      s""""insert_large_raw":${arr(withSketchBig)},""" +
      s""""insert_large_rows_per_sec":${nBig / med(withSketchBig)},""" +
      s""""insert_large_nosketch_sec":${med(noSketchBig)},""" +
      s""""insert_large_nosketch_raw":${arr(noSketchBig)},""" +
      s""""sidecar_overhead_large_pct":${pct(withSketchBig, noSketchBig)},""" +
      s""""sidecar_overhead_large_paired_pcts":${arr(pairedPcts(withSketchBig, noSketchBig))},""" +
      s""""sidecar_overhead_large_paired_stderr_pct":${stderrOf(pairedPcts(withSketchBig, noSketchBig))},""" +
      s""""sidecar_overhead_large_median_form_pct":${pctOfMedians(withSketchBig, noSketchBig)},""" +
      s""""sidecar_overhead_large_min_pct":${pctMin(withSketchBig, noSketchBig)},""" +
      s""""sink_preset":"small_batch_bloom",""" +
      s""""sink_sec":$sinkSec,"sink_rows_per_sec":${n / sinkSec},"sink_batches":${sinkMetrics.batches.get()},""" +
      s""""sink_insert_sec":$sinkInsert,"sink_maint_sec":$sinkMaint,""" +
      s""""sink_harness_sec":$sinkHarness,""" +
      s""""sink_insert_per_batch_sec":${arr(sinkMetrics.insertPerBatchSec)},""" +
      s""""sink_batch_floor_sec":$sinkBatchFloor,""" +
      s""""sink_duration_ms":${dursJson(sinkDurs)},""" +
      s""""sink_foreachbatch_rows_per_sec":${n / sinkInsert},""" +
      s""""sink1_sec":$sink1Sec,"sink1_batches":${sink1Metrics.batches.get()},""" +
      s""""sink1_insert_sec":${sink1Metrics.insertSec},""" +
      s""""sink1_maint_sec":${sink1Metrics.maintSec},""" +
      s""""sink1_duration_ms":${dursJson(sink1Durs)},""" +
      s""""sink1_foreachbatch_rows_per_sec":${n / sink1Metrics.insertSec}}"""
    (full, compact)
  }
}
