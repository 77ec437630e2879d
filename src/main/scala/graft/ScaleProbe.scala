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
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("upsert"))
      return upsertProbe(args(1),
        if (args.length > 2) args(2) else "user_id")
    if (args.headOption.contains("bucketjoin")) return bucketJoinProbe(args(1))
    if (args.headOption.contains("semantic2"))
      return semantic2Probe(args(1), args(2).toInt, args(3).toInt,
        args(4).toInt, if (args.length > 5) args(5).toDouble else 0.35)
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
      val runs = Seq.fill(3)(once())
      val keepers = runs.head._1
      val minSec = runs.map(_._2).min
      // agreement vs the flat argmax: threshold > 1 keeps every row, so
      // both outputs are the raw assignment surface (id -> cell)
      val flat = graft.operators.Dedup
        .semanticDedup(emb, "vec_id", "embedding", 1.1, nlist)
        .withColumnRenamed("cell", "cell_flat")
      val agree = graft.operators.Dedup
        .semanticDedupTwoLevel(emb, "vec_id", "embedding", 1.1,
          nlist, ncoarse, nprobe)
        .join(flat, Seq("vec_id"))
        .agg(avg((col("cell") === col("cell_flat")).cast("double")))
        .collect()(0).getDouble(0)
      println(f"""{"probe":"semantic_dedup_two_level","nlist":$nlist,"ncoarse":$ncoarse,"nprobe":$nprobe,"rows":$rows,"keepers":$keepers,"warm_sec":$warm%.4f,"min_sec":$minSec%.4f,"assign_agree":$agree%.4f}""")
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
    } finally spark.stop()
  }

  private def upsertProbe(sfDir: String, keyCol: String): Unit = {
    import graft.core.{ChronoConfig, ChronoDB, ChronoRow}
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
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
      } finally db.close()
    } finally spark.stop()
  }
}
