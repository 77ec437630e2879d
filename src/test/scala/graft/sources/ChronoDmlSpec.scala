package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** SQL row-level DML on catalog tables (VERDICT r16 Missing #1):
  * UPDATE and MERGE INTO through the session extension
  * ([[graft.plans.ChronoDmlExtensions]]) routed to the facade's
  * copy-on-write verbs — LOCK + manifest + sidecar protocol identical
  * to every other mutation path. DELETE is covered in
  * ChronoCatalogSpec (it rides SupportsDelete, no extension). */
class ChronoDmlSpec extends SparkSuite {

  private def freshCat(extra: Map[String, String] = Map.empty)
      : (String, String) = {
    val dir = Files.createTempDirectory("dml").toString
    val name = s"dml${System.nanoTime() % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.dataDir", dir)
    spark.conf.set(s"spark.sql.catalog.$name.bucket", "day")
    extra.foreach { case (k, v) =>
      spark.conf.set(s"spark.sql.catalog.$name.$k", v)
    }
    (name, dir)
  }

  private def seed(cat: String, table: String = "ev", rows: Int = 20): Unit = {
    spark.sql(s"CREATE TABLE $cat.$table " +
      "(key STRING, ts TIMESTAMP, v BIGINT, note STRING)")
    spark.sql(s"INSERT INTO $cat.$table (key, ts, v, note) SELECT " +
      "CAST(id AS STRING), " +
      s"timestamp_micros(1704067200000000 + id * 43200000000), id, 'orig' " +
      s"FROM range($rows)") // 2 rows/day over rows/2 day buckets
  }

  private def sidecarsOk(dir: String, table: String): Boolean = {
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(dir, bucket = "day"))
    try db.sidecarsConsistent(table) finally db.close()
  }

  test("UPDATE SET ... WHERE rewrites only the hit buckets; affected_rows returned") {
    val (cat, dir) = freshCat()
    seed(cat)
    val res = spark.sql(
      s"UPDATE $cat.ev SET note = 'hot', v = v * 10 WHERE v >= 16")
    assert(res.columns.toSeq === Seq("affected_rows"))
    assert(res.head().getLong(0) === 4L)
    val rows = spark.sql(
      s"SELECT key, v, note FROM $cat.ev WHERE note = 'hot' ORDER BY v")
      .collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(160L, 170L, 180L, 190L))
    // untouched rows intact, total preserved
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 20L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE note = 'orig'")
      .head().getLong(0) === 16L)
    assert(sidecarsOk(dir, "ev"))
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("UPDATE SET ts moves rows across buckets (re-bucket through the insert path)") {
    val (cat, dir) = freshCat()
    seed(cat)
    // move the first day's rows (v 0,1) forward by 30 days
    spark.sql(s"UPDATE $cat.ev SET ts = ts + INTERVAL 30 DAYS WHERE v <= 1")
    val buckets = spark.sql(
      s"SELECT v, bucket FROM $cat.ev WHERE v <= 1 ORDER BY v").collect()
    assert(buckets.map(_.getString(1)).forall(_ >= "2024-01-31"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 20L)
    assert(sidecarsOk(dir, "ev"))
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("MERGE INTO: matched update + matched-conditional delete + not-matched insert") {
    val (cat, dir) = freshCat()
    seed(cat)
    spark.range(14, 26).selectExpr("CAST(id AS STRING) AS mk",
        "id AS mv",
        "timestamp_micros(1704067200000000 + id * 43200000000) AS mts")
      .createOrReplaceTempView("changes")
    val res = spark.sql(
      s"""MERGE INTO $cat.ev t USING changes s ON t.key = s.mk
         |WHEN MATCHED AND s.mv >= 18 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.mv * 100, note = 'merged'
         |WHEN NOT MATCHED THEN INSERT (key, ts, v, note)
         |  VALUES (s.mk, s.mts, s.mv, 'new')""".stripMargin)
    // 6 matched (14..19): 2 deleted (18,19)? no — DELETE is mv >= 18 →
    // 18,19 deleted; 14..17 updated; 20..25 inserted (6)
    assert(res.head().getLong(0) === 12L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 24L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ev WHERE key IN ('18','19')")
      .head().getLong(0) === 0L)
    assert(spark.sql(
      s"SELECT sum(v) FROM $cat.ev WHERE note = 'merged'")
      .head().getLong(0) === (14L + 15 + 16 + 17) * 100)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE note = 'new'")
      .head().getLong(0) === 6L)
    assert(sidecarsOk(dir, "ev"))
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("MERGE INTO: NOT MATCHED BY SOURCE and cardinality violation") {
    val (cat, dir) = freshCat()
    seed(cat, rows = 6)
    spark.range(0, 3).selectExpr("CAST(id AS STRING) AS mk")
      .createOrReplaceTempView("keep3")
    spark.sql(
      s"""MERGE INTO $cat.ev t USING keep3 s ON t.key = s.mk
         |WHEN MATCHED THEN UPDATE SET note = 'kept'
         |WHEN NOT MATCHED BY SOURCE AND t.v >= 5 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET note = 'orphan'
         |""".stripMargin)
    val notes = spark.sql(s"SELECT key, note FROM $cat.ev ORDER BY CAST(key AS INT)")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(notes === Seq("0" -> "kept", "1" -> "kept", "2" -> "kept",
      "3" -> "orphan", "4" -> "orphan"))
    assert(sidecarsOk(dir, "ev"))
    // a target row matching two source rows raises the cardinality error
    spark.sql("SELECT '0' AS mk UNION ALL SELECT '0' AS mk")
      .createOrReplaceTempView("dup")
    val e = intercept[Exception] {
      spark.sql(s"MERGE INTO $cat.ev t USING dup s ON t.key = s.mk " +
        "WHEN MATCHED THEN UPDATE SET note = 'x'")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(x => x.getMessage != null &&
      x.getMessage.contains("cardinality violation")))
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("BY-SOURCE-only MERGE with a duplicate-matching source never duplicates target rows") {
    val (cat, dir) = freshCat()
    seed(cat, rows = 6)
    // key '1' appears TWICE in the source; with no matched actions the
    // cardinality rule does not apply — but the matched row must pass
    // through exactly ONCE (the left-outer form would duplicate it)
    spark.sql("SELECT '1' AS mk UNION ALL SELECT '1' UNION ALL SELECT '2'")
      .createOrReplaceTempView("dupsrc")
    val res = spark.sql(
      s"""MERGE INTO $cat.ev t USING dupsrc s ON t.key = s.mk
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET note = 'orphan'
         |""".stripMargin)
    assert(res.head().getLong(0) === 4L) // 6 rows − 2 matched
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 6L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE note = 'orig'")
      .head().getLong(0) === 2L) // keys 1,2 untouched, present ONCE each
    assert(sidecarsOk(dir, "ev"))
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("UPDATE SET ts = NULL fails loudly and loses nothing (the bucket axis guard)") {
    val (cat, dir) = freshCat()
    seed(cat, rows = 4)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.ev SET ts = NULL WHERE v = 1")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(x => x.getMessage != null &&
      x.getMessage.contains("NULL ts")))
    // nothing was mutated or lost
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 4L)
    assert(sidecarsOk(dir, "ev"))
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("MERGE with affected buckets above the literal-In budget stays correct and plans a broadcast semi-join, not a giant In") {
    // budget of 3 with a source touching 10 day-buckets — the restrict
    // must route through the facade's filterBuckets discipline
    val (cat, dir) = freshCat(Map("literalInLimit" -> "3"))
    seed(cat)  // 20 rows, 2/day over 10 day buckets
    val res = spark.sql(
      s"""MERGE INTO $cat.ev t USING (
         |  SELECT CAST(id AS STRING) AS mk, id * 100 AS mv FROM range(20)
         |) s ON t.key = s.mk
         |WHEN MATCHED AND t.v < 18 THEN UPDATE SET v = s.mv, note = 'm'
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(res.head().getLong(0) === 20L)
    val rows = spark.sql(
      s"SELECT key, v, note FROM $cat.ev ORDER BY CAST(key AS INT)")
      .collect()
    assert(rows.length === 18) // v=18,19 deleted
    assert(rows.forall(_.getString(2) == "m"))
    assert(rows.map(_.getLong(1)).toSeq === (0 until 18).map(_ * 100L))
    assert(sidecarsOk(dir, "ev"))
    // plan-shape pin at the unit level: above budget → semi join, at or
    // below → literal In (partition-prunable)
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(dir, bucket = "day", literalInLimit = 3))
    try {
      import org.apache.spark.sql.functions.col
      val df = spark.range(10).selectExpr(
        "cast(id as string) as bucket", "id as v")
      val above = db.filterBuckets(df, Seq("1", "2", "3", "4"),
        keep = true, bucketCol = col("bucket"))
        .queryExecution.optimizedPlan.toString
      assert(above.contains("LeftSemi"), above)
      assert(!above.contains(" IN ("), above)
      val below = db.filterBuckets(df, Seq("1", "2"),
        keep = true, bucketCol = col("bucket"))
        .queryExecution.optimizedPlan.toString
      assert(below.contains(" IN ("), below)
      assert(!below.contains("LeftSemi"), below)
    } finally db.close()
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("MERGE refusals: schema evolution, subquery condition, missing ts in INSERT") {
    val (cat, _) = freshCat()
    seed(cat, rows = 4)
    spark.range(0, 2).selectExpr("CAST(id AS STRING) AS mk",
      "timestamp_micros(1704067200000000) AS mts").createOrReplaceTempView("src2")
    intercept[Exception] {
      spark.sql(s"MERGE INTO $cat.ev t USING src2 s ON t.key = s.mk " +
        "WHEN NOT MATCHED THEN INSERT (key, v) VALUES (s.mk, 1)")
    }
    intercept[Exception] {
      spark.sql(s"MERGE INTO $cat.ev t USING src2 s " +
        "ON t.key = s.mk AND t.v > (SELECT 1) " +
        "WHEN MATCHED THEN UPDATE SET note = 'x'")
    }
    // sanity: insert-only merge (no matched actions — no rewrite at all)
    val res = spark.sql(s"MERGE INTO $cat.ev t USING src2 s " +
      "ON t.key = CONCAT('z', s.mk) " +
      "WHEN NOT MATCHED THEN INSERT (key, ts, v, note) " +
      "VALUES (CONCAT('z', s.mk), s.mts, -1, 'ins')")
    assert(res.head().getLong(0) === 2L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE note = 'ins'")
      .head().getLong(0) === 2L)
    spark.sql(s"DROP TABLE $cat.ev")
  }
}
