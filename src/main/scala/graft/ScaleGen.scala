package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived-scale fixture generator for the scaling-curve evidence run
  * (BASELINE.md "scaling curve" section). Reads the driver's sf0.1
  * fixtures and writes a REPLICATION×-larger dataset that preserves each
  * query's *selectivity structure* so measured 1×/k× time ratios isolate
  * the ALGORITHM's growth, not a data-distribution change:
  *
  *  - fact tables (lineitem, orders, events, documents, embeddings) are
  *    replicated k× with key-space offsets chosen so joins stay
  *    within-replica (join degree per key unchanged → join output scales
  *    exactly k×); dimension tables (region, nation, customer, supplier,
  *    part) are copied 1× — the realistic shape of a scale-up (facts
  *    grow, dims don't), and o_custkey/l_partkey/l_suppkey references
  *    stay valid, each dim key simply gaining k× fact rows;
  *  - timestamps are kept IDENTICAL across replicas: the declared
  *    queries' literal time windows (CoreQueries lo/hi, Jan 2024) then
  *    select the same FRACTION of rows at every scale — density scales,
  *    selectivity doesn't;
  *  - events.user_id is offset per replica (k× users, same events/user)
  *    EXCEPT replicas sharing i%2 — so user count grows 5× and per-user
  *    density 2× at k=10, exercising both axes of the sessionize /
  *    per-key-window family;
  *  - documents.text for replicas i>0 is deterministically word-scrambled
  *    (words reordered by xxhash64(word, pos, doc_id, i)) — replicas are
  *    NOT near-duplicates of their source doc, so the corpus's near-dup
  *    pair DENSITY stays ~constant rather than every doc gaining 9
  *    artificial twins (which would grow LSH verify work by data fiat and
  *    pollute the algorithm measurement);
  *  - embeddings are perturbed per replica (deterministic per-element
  *    jitter, then L2-renormalized like the source vectors) so ANN
  *    bucket occupancy grows smoothly instead of k vectors per point.
  *
  * Fully deterministic (hash-derived jitter, no RNG), one job per table,
  * ~32 output files per fact table. Usage:
  *   sbt "runMain graft.ScaleGen <outDir> [replication=10] [sfDir=/root/testdata/sf0.1] [tables=all]"
  * (tables: comma-separated subset, e.g. "documents,embeddings" for a
  * third-decade corpus without the 600 M-row fact tables)
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("derived_sf1")
    val k = if (args.length > 1) args(1).toInt else 10
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty[String]
    try generate(spark, sfDir, outDir, k, tables)
    finally spark.stop()
  }

  /** @param only restrict generation to these tables (empty = all) —
    *   lets a THIRD-decade corpus (documents/embeddings at 1000×) be
    *   derived without also writing a 600 M-row lineitem. */
  def generate(spark: SparkSession, sfDir: String, outDir: String, k: Int,
      only: Set[String] = Set.empty): Unit = {
    def src(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      df.repartition(parts).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }
    // replica index table; crossJoin'ing a k-row broadcast side fans each
    // source row out k× without a shuffle
    val reps = broadcast(spark.range(0, k).toDF("rep"))
    // key offsets far above any source key (sf0.1 maxima are ~6e5)
    val STEP = 1000000000L

    // dims: straight copy
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      write(src(n), n, 1)
    }

    // orders / lineitem: offset the join key identically on both sides so
    // the orderkey join stays within-replica
    write(src("orders").crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * STEP)
      .drop("rep"), "orders", 16)
    write(src("lineitem").crossJoin(reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * STEP)
      .drop("rep"), "lineitem", 32)

    // events: unique event_id per replica; user space grows k/2×, density
    // per user 2× (rep DIV 2 shares a user offset between replica pairs)
    write(src("events").crossJoin(reps)
      .withColumn("event_id", col("event_id") + col("rep") * STEP)
      .withColumn("user_id", col("user_id") + expr("rep DIV 2") * STEP)
      .drop("rep"), "events", 16)

    // documents: replica 0 verbatim (original near-dup structure kept
    // once); replicas >0 word-scrambled by hash order AND token-suffixed
    // with the replica index. The suffix is the r13 fixture fix: scramble
    // alone leaves every replica the same word MULTISET, whose residual
    // shingle/window overlap grows with C(k,2) replica pairs — at k=1000
    // the third-decade d2/d35 points were measuring that permutation
    // mass, not the engine (BASELINE.md r12 caveat). With `wq<rep>`
    // tokens no gram or shingle can match across replicas, so dup mass
    // stays constant (= replica 0's own near-dup structure) at every
    // derived scale and the decade ratio reads the engine.
    val doc = src("documents")
    val scrambled = doc.crossJoin(reps).where(col("rep") > 0)
      .withColumn("text",
        array_join(
          transform(
            array_sort(
              // pair each word with its deterministic per-(doc,rep) rank
              transform(
                filter(split(col("text"), " "), w => length(w) > 0),
                (w, i) => struct(
                  xxhash64(w, i, col("doc_id"), col("rep")).as("h"),
                  w.as("w")))),
            p => concat(p.getField("w"), lit("q"),
              col("rep").cast("string"))),
          " "))
      .withColumn("doc_id", col("doc_id") + col("rep") * STEP)
      .withColumn("n_chars", length(col("text")))
      .drop("rep")
    write(doc.unionByName(scrambled), "documents", 16)

    // embeddings: per-replica deterministic jitter then L2 renorm
    val emb = src("embeddings")
    val jittered = emb.crossJoin(reps).where(col("rep") > 0)
      .withColumn("embedding",
        transform(col("embedding"),
          (x, i) => x + (pmod(xxhash64(col("vec_id"), col("rep"), i), lit(1000L))
            .cast("float") / lit(1000.0f) - lit(0.5f)) * lit(0.12f)))
      .withColumn("_n",
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .withColumn("embedding",
        transform(col("embedding"), x => (x / col("_n")).cast("float")))
      .withColumn("vec_id", col("vec_id") + col("rep") * STEP)
      .drop("rep", "_n")
    write(emb.unionByName(jittered), "embeddings", 8)

    println(s"[scalegen] done: $outDir at ${k}x $sfDir")
  }
}
