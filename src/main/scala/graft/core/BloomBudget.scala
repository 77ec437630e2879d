package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-budget measurement for the sidecar key index at large bucket
  * counts (VERDICT r10 item 6): builds a synthetic table whose sidecar
  * has N hourly buckets (default 10 000 ≈ 13.7 months of hours), then
  * times
  *  (a) the RETIRED formulation — fold the sidecar and collect every
  *      bucket's ~4 KB bloom to the driver, probe there;
  *  (b) the shipped executor-side probe
  *      ([[ChronoDB.multiKeyCandidateBuckets]] via
  *      [[graft.functions.SidecarKeyProbeExpr]]) at probe-set sizes
  *      1 / 100 / 10 000;
  *  (c) the end-to-end batch lookup `queryKeys(100 keys)`.
  * Measured numbers live in SCALE.md §5. Dev tool, not driver contract.
  *
  * Usage: sbt "runMain graft.core.BloomBudget [buckets=10000] [rowsPerBucket=10]"
  */
object BloomBudget {
  def main(args: Array[String]): Unit = {
    val nBuckets = args.headOption.map(_.toInt).getOrElse(10000)
    val perBucket = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("bloombudget").toString
    try run(spark, dir, nBuckets, perBucket)
    finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  def run(spark: SparkSession, dir: String, nBuckets: Int, perBucket: Int): Unit = {
    import spark.implicits._
    val db = new ChronoDB(spark, ChronoConfig(dir, writersPerBucket = 1))
    db.createTable("budget")
    val n = nBuckets.toLong * perBucket
    val base = java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[budget] $what: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
    val rows = spark.range(n).select(
      format_string("k%07d", col("id") % (n / 2)).as("key"),
      timestamp_millis(lit(base) + (col("id") % nBuckets) * 3600000L +
        expr(s"id DIV $nBuckets") * 60000L).as("ts"),
      lit("v").cast("binary").as("data")).as[ChronoRow]
    timed(s"insert ${n} rows across $nBuckets hourly buckets")(
      db.insert("budget", rows))

    // (a) retired driver-side formulation: fold + collect blooms
    val sidecar = spark.read.parquet(s"$dir/budget/_stats")
    import graft.functions.SketchAggs
    val oldStyle = timed("OLD driver fold: collect (bucket,min,max,bloom)") {
      sidecar.groupBy(col("bucket")).agg(
        when(max(col("key_min").isNull), lit(null).cast("string"))
          .otherwise(min(col("key_min"))).as("key_min"),
        when(max(col("key_max").isNull), lit(null).cast("string"))
          .otherwise(max(col("key_max"))).as("key_max"),
        SketchAggs.bloomOr(col("bloom")).as("bloom")).collect()
    }
    val bloomBytes = oldStyle.map(r =>
      if (r.isNullAt(3)) 0L else r.getAs[Array[Byte]](3).length.toLong).sum
    println(s"[budget] OLD path driver payload: ${oldStyle.length} buckets, " +
      f"${bloomBytes / 1048576.0}%.1f MiB of blooms")

    // (b) shipped executor-side probe at three probe-set sizes
    def keySet(k: Int): Seq[String] =
      (0 until k).map(i => f"k${(i * 37) % (n / 2)}%07d")
    Seq(1, 100, 10000).foreach { k =>
      val keys = keySet(k)
      // warm + 2 timed
      db.multiKeyCandidateBuckets("budget", keys)
      (1 to 2).foreach { _ =>
        val cand = timed(s"NEW executor probe, ${keys.size} keys")(
          db.multiKeyCandidateBuckets("budget", keys))
        println(s"[budget]   candidates: ${cand.map(_.size).getOrElse(-1)} of $nBuckets buckets")
      }
    }

    // (c) end-to-end batch lookup — manifest-planned scan (r13): the
    // index probe was never the cost; InMemoryFileIndex's directory
    // walk was (measured 18.1 s of 18.7 s at 10 k one-file dirs, r12).
    // ManifestFileIndex plans from the _manifest sidecar instead.
    val keys100 = keySet(100)
    db.queryKeys("budget", keys100).count()
    val got = timed("end-to-end queryKeys(100).count [manifest]")(
      db.queryKeys("budget", keys100).count())
    println(s"[budget] queryKeys rows: $got")
    db.close()
    // same lookup through the legacy listing path (manifest = false):
    // the A/B that prices the retired directory walk
    val legacy = new ChronoDB(spark,
      ChronoConfig(dir, writersPerBucket = 1, manifest = false))
    legacy.queryKeys("budget", keys100).count()
    val gotLegacy = timed("end-to-end queryKeys(100).count [legacy listing]")(
      legacy.queryKeys("budget", keys100).count())
    require(gotLegacy == got, s"path disagreement: $gotLegacy vs $got")
    legacy.close()
  }
}
