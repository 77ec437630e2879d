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
  * Usage: sbt "runMain graft.ScaleProbe <sfDir> <nlist> [threshold]"
  * Prints one JSON line: {"probe":"semantic_dedup","nlist":N,
  * "rows":n,"keepers":k,"warm_sec":…,"min_sec":…}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nlist = args(1).toInt
    val threshold = if (args.length > 2) args(2).toDouble else 0.35
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
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
      val runs = Seq.fill(3)(once())
      val keepers = runs.head._1
      val minSec = runs.map(_._2).min
      println(f"""{"probe":"semantic_dedup","nlist":$nlist,"rows":$rows,"keepers":$keepers,"warm_sec":$warm%.4f,"min_sec":$minSec%.4f}""")
    } finally spark.stop()
  }
}
