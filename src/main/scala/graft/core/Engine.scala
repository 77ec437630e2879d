package graft.core

import org.apache.spark.sql.SparkSession

/** Session-level conveniences: build a properly-configured session and
  * expose the fixture tables to `spark.sql(...)`. */
object Engine {

  /** Recommended session settings (mirrors Bench/Verify): AQE on, small
    * shuffle fan-out for local mode, UTC for oracle parity. */
  def session(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // analyzer-level DML extension (UPDATE/MERGE on chrono catalog
      // tables) — must ride session CREATION; installOptimizations can
      // only add optimizer rules post-hoc
      .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    installOptimizations(spark)
    spark
  }

  /** Install the engine's optimizer rules (idempotent): the raw-ns
    * range-pushdown rewrite (graft.plans.NsEpochRangeRule), the chrono
    * bucket-partition deriver (graft.plans.BucketPruneRule), and the
    * bucketed-twin auto-router (graft.plans.BucketedTwinRule). */
  def installOptimizations(spark: SparkSession): Unit = {
    val rules = Seq(graft.plans.NsEpochRangeRule, graft.plans.BucketPruneRule,
      graft.plans.BucketedTwinRule)
    val cur = spark.sessionState.experimentalMethods.extraOptimizations
    spark.sessionState.experimentalMethods.extraOptimizations =
      cur ++ rules.filterNot(cur.contains)
  }

  /** Register every fixture table as a temp view so the full engine
    * surface is reachable through plain SQL. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      Tables.t(spark, dir, name).createOrReplaceTempView(name)
    }

  /** Register every table of a [[ChronoDB]] as a temp view
    * (`<prefix><table>`, default `chrono_`), so the STORAGE layer is
    * reachable through plain SQL too — `spark.sql("SELECT ... FROM
    * chrono_events WHERE ts BETWEEN ...")` plans against the same
    * partition-pruned parquet frame [[ChronoDB.table]] serves (the
    * reference's "Advanced querying capabilities" promise, README.md:
    * 109-112, over its storage engine). The view SNAPSHOTS the parquet
    * file listing at registration (Spark caches the relation's
    * FileIndex): after out-of-band inserts, re-register — or
    * `spark.catalog.refreshByPath(dataDir)` — to see new files. */
  def registerChronoViews(db: ChronoDB, prefix: String = "chrono_"): Unit =
    db.listTables().foreach { name =>
      db.table(name).createOrReplaceTempView(prefix + name)
    }

  /** Expose the native expressions to SQL:
    * minhash_sig(text, k, n), simhash64(text), hyperplane_sig(vec, bits,
    * seed), cosine_native(a, b), shingle_jaccard(a, b, k),
    * shingle_hashes(text, k), sorted_jaccard(ha, hb),
    * doc_fingerprint(text), token_hash62(s), int8_quantize(vec),
    * int8_dot(a, b), pq_encode(vec, cents, m, subDim),
    * topk_by_score(score, id, k) (aggregate),
    * ngrams_explode(text, n) (table-generating). */
  def registerFunctions(spark: SparkSession): Unit = {
    import graft.functions.NativeExpressions._
    import graft.functions.TopKByScoreAgg
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def intArg(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSigExpr(es.head, intArg(es(1), "shingleK"), intArg(es(2), "numHashes")),
      "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHashExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_sig",
      es => HyperplaneSigExpr(es.head, intArg(es(1), "numBits"), intArg(es(2), "seed")),
      "scala_udf")
    reg.createOrReplaceTempFunction("cosine_native",
      es => CosineExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_jaccard",
      es => ShingleJaccardExpr(es.head, es(1), intArg(es(2), "k")), "scala_udf")
    reg.createOrReplaceTempFunction("doc_fingerprint",
      es => FingerprintExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("token_hash62",
      es => TokenHash62Expr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("int8_quantize",
      es => Int8QuantizeExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("int8_dot",
      es => Int8DotExpr(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("pq_encode",
      es => PqEncodeExpr(es.head, es(1),
        intArg(es(2), "m"), intArg(es(3), "subDim")), "scala_udf")
    // the set-similarity decomposition (the d2/d27 verify hot path):
    // shingle_hashes(text, k) pre-hashes each side ONCE, sorted_jaccard
    // merge-walks two pre-hashed sets — `SELECT sorted_jaccard(
    // shingle_hashes(a.text, 3), shingle_hashes(b.text, 3))`
    reg.createOrReplaceTempFunction("shingle_hashes",
      es => ShingleHashesExpr(es.head, intArg(es(1), "k")), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_jaccard",
      es => SortedJaccardExpr(es.head, es(1)), "scala_udf")
    // aggregate (UDAF surface): SELECT g, topk_by_score(score, id, 5) ...
    reg.createOrReplaceTempFunction("topk_by_score",
      es => TopKByScoreAgg(es.head, es(1), intArg(es(2), "k"))
        .toAggregateExpression(),
      "scala_udf")
    // generator (UDTF surface): SELECT ngrams_explode(text, 3) FROM docs
    // or LATERAL VIEW ngrams_explode(text, 3)
    reg.createOrReplaceTempFunction("ngrams_explode",
      es => NGramsExplodeExpr(es.head, intArg(es(1), "n")), "scala_udf")
  }
}
