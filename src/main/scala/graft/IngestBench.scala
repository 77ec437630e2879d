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
  * excluded — this times the WRITE path), then each configuration gets
  * one untimed warm-up insert plus three timed inserts into fresh table
  * dirs (median + min + raw, the query protocol). Sidecar overhead =
  * (sketches-on − sketches-off) / off, the number that decides whether
  * per-batch stats are affordable at production ingest rates.
  *
  * Reading the overhead number honestly: the sidecar is ONE fused
  * aggregation job (HLL + row count + dense CMS counters in a single
  * groupBy — see ChronoDB.sidecarAggs) appending one small file, run
  * strictly AFTER the data write so a crash between the two is
  * detectable (sidecarsConsistent) — so its floor is one extra job
  * schedule + batch scan + file commit (~0.2-0.3 s here) regardless of
  * batch size. Against this fixture's ~0.7 s / 100k-row data write that
  * floor reads as ~50-100% overhead; the bytes-proportional component
  * (hash updates + KB-scale sketch state) is small, so the ratio falls
  * linearly with batch size — at the multi-million-row batches a real
  * ingest pipeline flushes, the same sidecar costs a few percent. The
  * raw per-config seconds are emitted so that analysis can be re-done
  * from the artifact.
  *
  * Bucket granularity is DAY here: at sf0.1 the events fixture spans 720
  * hours, and hour-granularity would make the 100k-row benchmark a
  * small-file filesystem test (139 rows/bucket) instead of a write-path
  * test. Day buckets (30 dirs, ~3.3k rows each) keep the salted-writer
  * fan-out real without drowning the signal in directory churn.
  */
object IngestBench {

  /** Returns a JSON object string (no trailing newline) with the ingest
    * timings, e.g. {"rows":100000,"insert_sec":...}. */
  def run(spark: SparkSession, sfDir: String): String = {
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

    def freshDir(): Path = Files.createTempDirectory("ingest_bench")
    def rmr(p: Path): Unit = {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }
    def cfg(dir: Path, sketches: Boolean): ChronoConfig =
      ChronoConfig(dir.toString, bucket = "day",
        sketchLgK = if (sketches) 12 else 0,
        sketchCmsDepth = if (sketches) 4 else 0)

    /** One untimed warm-up + three timed inserts; returns raw seconds. */
    def time3Insert(sketches: Boolean): Seq[Double] =
      (0 to 3).map { i =>
        val dir = freshDir()
        val db = new ChronoDB(spark, cfg(dir, sketches))
        try {
          db.createTable("events")
          val t0 = System.nanoTime()
          db.insert("events", rows)
          (System.nanoTime() - t0) / 1e9
        } finally { db.close(); rmr(dir) }
      }.drop(1)

    val withSketch = time3Insert(sketches = true)
    val noSketch = time3Insert(sketches = false)

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
    val sinkDir = freshDir()
    val cp = freshDir()
    val sinkDb = new ChronoDB(spark, cfg(sinkDir, sketches = true))
    val sinkSec =
      try {
        sinkDb.createTable("events")
        val src = spark.readStream
          .schema("key STRING, ts TIMESTAMP, data BINARY")
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
        val t0 = System.nanoTime()
        val q = graft.streaming.Streams.chronoSink(src, sinkDb, "events",
          cp.toString, compactEvery = 2, trigger = Trigger.AvailableNow()).start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      } finally { sinkDb.close(); rmr(sinkDir); rmr(cp); rmr(landing) }

    base.unpersist()

    def med(xs: Seq[Double]): Double = xs.sorted.apply(1)
    val overheadPct =
      (med(withSketch) - med(noSketch)) / med(noSketch) * 100.0
    def arr(xs: Seq[Double]): String = xs.mkString("[", ",", "]")
    s"""{"rows":$n,"insert_sec":${med(withSketch)},"insert_sec_min":${withSketch.min},""" +
      s""""insert_raw":${arr(withSketch)},"insert_rows_per_sec":${n / med(withSketch)},""" +
      s""""insert_nosketch_sec":${med(noSketch)},"insert_nosketch_raw":${arr(noSketch)},""" +
      s""""sidecar_overhead_pct":$overheadPct,""" +
      s""""sink_sec":$sinkSec,"sink_rows_per_sec":${n / sinkSec},"sink_batches":4}"""
  }
}
