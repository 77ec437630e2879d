package graft.core

import graft.SparkSuite

class EngineSpec extends SparkSuite {
  import spark.implicits._

  test("registerTables exposes the surface through spark.sql") {
    Engine.registerTables(spark, sf())
    val n = spark.sql(
      """SELECT event_type, COUNT(*) AS n FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
        |              AND TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
    assert(n.count() === 5)
    val joined = spark.sql(
      """SELECT r_name, COUNT(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(joined.as[(String, Long)].collect().map(_._2).sum === 150L)
  }

  test("registerFunctions exposes native expressions to SQL") {
    Engine.registerTables(spark, sf())
    Engine.registerFunctions(spark)
    val row = spark.sql(
      """SELECT doc_id,
        |       simhash64(text) AS sig,
        |       shingle_jaccard(text, text, 3) AS self_j,
        |       size(minhash_sig(text, 3, 16)) AS n_hashes
        |FROM documents ORDER BY doc_id LIMIT 1""".stripMargin).head()
    assert(row.getAs[Double]("self_j") === 1.0)
    assert(row.getAs[Int]("n_hashes") === 16)
    val cos = spark.sql(
      """SELECT cosine_native(embedding, embedding) AS c
        |FROM embeddings ORDER BY vec_id LIMIT 1""".stripMargin)
      .head().getAs[Double]("c")
    assert(math.abs(cos - 1.0) < 1e-12)
    val fp = spark.sql("SELECT doc_fingerprint('hello world') AS f").head()
    assert(fp.getAs[Long]("f") ===
      "hello world".foldLeft(0L)((h, c) => (h * 131L + c.toLong) % 2147483647L))
    // int8 pair: self-dot of a unit-normalized code vector is near 127²·dims-ish
    // in magnitude; just pin shape + symmetry through the SQL surface
    val i8 = spark.sql(
      """SELECT length(int8_quantize(embedding)) AS len,
        |       int8_dot(int8_quantize(embedding), int8_quantize(embedding)) AS d
        |FROM embeddings ORDER BY vec_id LIMIT 1""".stripMargin).head()
    assert(i8.getAs[Int]("len") > 0)
    assert(i8.getAs[Long]("d") > 0L)
    // pq_encode: a vector quantized against a codebook containing
    // itself (cell 1) and an orthogonal one (cell 0) picks itself
    val pq = spark.sql(
      """SELECT pq_encode(array(1.0F, 0.0F),
        |         array(named_struct('cell', 0, 'cv', array(0.0F, 1.0F)),
        |               named_struct('cell', 1, 'cv', array(1.0F, 0.0F))),
        |         1, 2) AS code""".stripMargin).head()
    assert(pq.getAs[scala.collection.Seq[Int]]("code") === Seq(1))
    // the decomposed set-similarity pair: pre-hash once per side, then
    // merge-walk — must equal the one-shot shingle_jaccard
    val sj = spark.sql(
      """SELECT a.doc_id AS ia, b.doc_id AS ib,
        |       sorted_jaccard(shingle_hashes(a.text, 3),
        |                      shingle_hashes(b.text, 3)) AS j2,
        |       shingle_jaccard(a.text, b.text, 3) AS j1
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id LIMIT 5""".stripMargin).collect()
    assert(sj.nonEmpty)
    sj.foreach(r =>
      assert(r.getAs[Double]("j2") === r.getAs[Double]("j1")))
  }

  test("registerFunctions exposes the UDAF and UDTF surfaces to SQL") {
    Engine.registerTables(spark, sf())
    Engine.registerFunctions(spark)
    // aggregate: 0.9 wins, then the 0.5-tie breaks to the smaller id
    val tk = spark.sql(
      """SELECT topk_by_score(score, id, 2) AS tk
        |FROM VALUES (1L, 0.5D), (2L, 0.5D), (3L, 0.9D), (4L, 0.1D)
        |  AS t(id, score)""".stripMargin)
      .selectExpr("transform(tk, e -> e.id) AS ids")
      .head().getAs[scala.collection.Seq[Long]]("ids")
    assert(tk.toSeq === Seq(3L, 1L))
    // generator: n-gram rows via LATERAL VIEW
    val grams = spark.sql(
      """SELECT pos, ngram FROM (SELECT 'The quick brown fox' AS s)
        |LATERAL VIEW ngrams_explode(s, 2) AS pos, ngram
        |ORDER BY pos""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(grams.toSeq === Seq((0, "the quick"), (1, "quick brown"), (2, "brown fox")))
  }

  test("registerChronoViews exposes storage tables through spark.sql") {
    val dir = java.nio.file.Files.createTempDirectory("chronosql").toString
    val db = new ChronoDB(spark, ChronoConfig.smallBatch(dir))
    db.createTable("events")
    db.insertSeq("events", Seq(
      ChronoRow("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "x".getBytes),
      ChronoRow("a", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "y".getBytes),
      ChronoRow("b", java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), "z".getBytes)))
    Engine.registerChronoViews(db)
    val got = spark.sql(
      """SELECT key, COUNT(*) AS n FROM chrono_events
        |WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
        |GROUP BY key ORDER BY key""".stripMargin)
      .as[(String, Long)].collect()
    assert(got.toSeq === Seq(("a", 2L)))
    // the view snapshots the file listing — re-register after inserts
    db.insertSeq("events", Seq(
      ChronoRow("c", java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "w".getBytes)))
    Engine.registerChronoViews(db)
    assert(spark.sql("SELECT COUNT(*) FROM chrono_events").head().getLong(0) === 4L)
    db.close()
  }

  test("BucketPruneRule: SQL ts range over a chrono_ view prunes partition files") {
    Engine.installOptimizations(spark)
    val dir = java.nio.file.Files.createTempDirectory("chronoprune").toString
    // hour buckets, one writer → exactly one file per bucket
    val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "hour",
      sketchLgK = 0, sketchCmsDepth = 0, writersPerBucket = 1))
    db.createTable("ev")
    db.insertSeq("ev", (0 until 12).map { h =>
      ChronoRow(s"k$h",
        java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"), "x".getBytes)
    })
    Engine.registerChronoViews(db)
    assert(db.stats("ev").numFiles === 12)
    // no bucket predicate in the SQL — the rule must derive it from the
    // ts bounds: [03:00, 06:00) spans hour buckets 03..06 (the <-bound
    // relaxes to its own bucket), so exactly 4 of 12 files scan
    val q = spark.sql(
      """SELECT key FROM chrono_ev
        |WHERE ts >= TIMESTAMP '2024-01-01 03:00:00'
        |  AND ts < TIMESTAMP '2024-01-01 06:00:00'
        |ORDER BY key""".stripMargin)
    assert(q.collect().map(_.getString(0)).toSeq === Seq("k3", "k4", "k5"))
    assert(PlanMetrics.scannedFiles(q.queryExecution.executedPlan) === 4L)
    // the same range through the DataFrame API (no view) prunes too
    val df = db.table("ev")
      .filter(org.apache.spark.sql.functions.col("ts")
        .between("2024-01-01 07:30:00", "2024-01-01 08:30:00"))
      .select("key")
    assert(df.collect().map(_.getString(0)).sorted.toSeq === Seq("k7", "k8"))
    assert(PlanMetrics.scannedFiles(df.queryExecution.executedPlan) === 2L)
    db.close()
  }
}
