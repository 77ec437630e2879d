package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** The chrono V2 TableCatalog (VERDICT r15 Missing #5): DB-level SQL —
  * CREATE/INSERT/SELECT/SHOW/DROP over a dataDir with no facade import,
  * DDL+DML routed through the facade verbs (LOCK + delete protocol +
  * commit protocol), reads on the stock V2 parquet stack over the
  * manifest-built index. */
class ChronoCatalogSpec extends SparkSuite {

  private def freshCat(opts: (String, String)*): String = {
    val dir = Files.createTempDirectory("cat").toString
    val name = s"cat${System.nanoTime() % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.dataDir", dir)
    opts.foreach { case (k, v) =>
      spark.conf.set(s"spark.sql.catalog.$name.$k", v) }
    name
  }

  test("CALL system.build_ann_index / ann_rebuild_if_stale: the ANN lifecycle from SQL alone") {
    val cat = freshCat("bucket" -> "day")
    spark.sql(s"CREATE TABLE $cat.vecs " +
      "(vec_id BIGINT, ts TIMESTAMP, embedding ARRAY<FLOAT>)")
    spark.sql(s"INSERT INTO $cat.vecs (vec_id, ts, embedding) " +
      "SELECT id AS vec_id, " +
      "TIMESTAMP '2024-01-01 10:00:00' AS ts, " +
      "transform(sequence(0, 7), j -> cast(" +
      "  (case when j = cast(id % 2 as int) then 1.0 else 0.0 end)" +
      "  + sin(id * 7 + j) * 0.1 as float)) AS embedding " +
      "FROM range(100)")
    assert(spark.sql(
        s"CALL $cat.system.build_ann_index('vecs', 'vec_id', 'embedding', 8)")
      .head().getLong(0) === 8L)
    // fresh → the repair verb is a no-op
    assert(spark.sql(s"CALL $cat.system.ann_rebuild_if_stale('vecs')")
      .head().getLong(0) === 0L)
    // an INSERT leaves the index servable (delta union) but not fresh
    // → the repair verb runs, as the cheap DELTA APPEND (r20)
    spark.sql(s"INSERT INTO $cat.vecs (vec_id, ts, embedding) " +
      "SELECT 9000L, " +
      "TIMESTAMP '2024-01-01 11:00:00', " +
      "transform(sequence(0, 7), j -> cast(0.5 as float))")
    assert(spark.sql(s"CALL $cat.system.ann_rebuild_if_stale('vecs')")
      .head().getLong(0) === 1L)
    spark.sql(s"DROP TABLE $cat.vecs")
  }

  test("CALL system.ann_topk / semantic_dedup_stored: SQL serving — live through inserts, refusing after DML (r20)") {
    val cat = freshCat("bucket" -> "day")
    spark.sql(s"CREATE TABLE $cat.vecs " +
      "(vec_id BIGINT, ts TIMESTAMP, embedding ARRAY<FLOAT>)")
    spark.sql(s"INSERT INTO $cat.vecs (vec_id, ts, embedding) " +
      "SELECT id AS vec_id, " +
      "TIMESTAMP '2024-01-01 10:00:00' AS ts, " +
      "transform(sequence(0, 7), j -> cast(" +
      "  (case when j = cast(id % 2 as int) then 1.0 else 0.0 end)" +
      "  + sin(id * 7 + j) * 0.1 as float)) AS embedding " +
      "FROM range(100)")
    spark.sql(
      s"CALL $cat.system.build_ann_index('vecs', 'vec_id', 'embedding', 8)")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW cat_ann_q AS " +
      s"SELECT vec_id, embedding FROM $cat.vecs WHERE vec_id < 4")
    val served = spark.sql(
      s"CALL $cat.system.ann_topk('vecs', 'cat_ann_q', 3, 8)").collect()
    assert(served.length === 4 * 3)
    assert(served.map(_.getInt(1)).toSet === Set(1, 2, 3))
    // INSERT vec 9000 as an exact copy of query 0's vector: the SQL
    // serve must surface it LIVE (delta union — no rebuild verb ran)
    spark.sql(s"INSERT INTO $cat.vecs (vec_id, ts, embedding) " +
      "SELECT 9000L, TIMESTAMP '2024-01-02 10:00:00', " +
      "transform(sequence(0, 7), j -> cast(" +
      "  (case when j = 0 then 1.0 else 0.0 end)" +
      "  + sin(j) * 0.1 as float))")
    val live = spark.sql(
      s"CALL $cat.system.ann_topk('vecs', 'cat_ann_q', 3, 8)").collect()
    assert(live.exists(r => r.getLong(0) === 0L && r.getLong(2) === 9000L),
      "the post-build insert must surface as query 0's neighbor, live")
    // the keeper view registers LAZILY (corpus-scale results never
    // materialize on the driver) and composes from plain SQL
    assert(spark.sql(s"CALL $cat.system.semantic_dedup_stored(" +
      "'vecs', CAST(0.8 AS DOUBLE), 'cat_ann_keep')")
      .head().getString(0) === "cat_ann_keep")
    val keepers = spark.sql("SELECT count(*) AS n FROM cat_ann_keep")
      .head().getLong(0)
    assert(keepers >= 1L && keepers <= 101L)
    // a row REWRITE refuses through SQL too, until the repair verb
    spark.sql(s"DELETE FROM $cat.vecs WHERE vec_id = 9000")
    val e = intercept[Exception](spark.sql(
      s"CALL $cat.system.ann_topk('vecs', 'cat_ann_q', 3, 8)").collect())
    assert(e.getMessage.contains("cannot serve") ||
      Option(e.getCause).exists(_.getMessage.contains("cannot serve")))
    assert(spark.sql(s"CALL $cat.system.ann_rebuild_if_stale('vecs')")
      .head().getLong(0) === 1L)
    assert(spark.sql(
        s"CALL $cat.system.ann_topk('vecs', 'cat_ann_q', 3, 8)")
      .collect().length === 12)
    spark.sql("DROP VIEW cat_ann_q")
    spark.sql("DROP VIEW cat_ann_keep")
    spark.sql(s"DROP TABLE $cat.vecs")
  }

  test("SQL-only lifecycle: CREATE, INSERT, SELECT, SHOW, DROP") {
    val cat = freshCat("bucket" -> "day")
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, data BINARY)")
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSeq === Seq("ev"))
    spark.sql(s"INSERT INTO $cat.ev (key, ts, data) VALUES " +
      "('a', TIMESTAMP '2024-01-01 10:00:00', X'01')," +
      "('b', TIMESTAMP '2024-01-02 11:00:00', X'02')," +
      "('a', TIMESTAMP '2024-01-03 12:00:00', X'03')")
    val rows = spark.sql(
      s"SELECT key, ts FROM $cat.ev ORDER BY ts").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b", "a"))
    // the scan serves bucket too (same surface as every chrono read)
    assert(spark.table(s"$cat.ev").columns.toSeq ===
      Seq("key", "ts", "data", "bucket"))
    // second INSERT appends (manifest protocol — both batches visible)
    spark.sql(s"INSERT INTO $cat.ev (key, ts, data) VALUES " +
      "('c', TIMESTAMP '2024-01-04 09:00:00', X'04')")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.ev")
      .head().getLong(0) === 4L)
    assert(spark.sql(s"DROP TABLE $cat.ev").collect().isEmpty)
    assert(spark.sql(s"SHOW TABLES IN $cat").isEmpty)
  }

  test("typed CREATE TABLE: declared columns round-trip; ts is required") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.docs " +
      "(doc_id BIGINT, ts TIMESTAMP, text STRING, score DOUBLE)")
    spark.sql(s"INSERT INTO $cat.docs (doc_id, ts, text, score) VALUES " +
      "(1, TIMESTAMP '2024-01-01 10:00:00', 'hello world', 0.5)")
    val row = spark.sql(
      s"SELECT doc_id, text, score FROM $cat.docs").head()
    assert(row.getLong(0) === 1L && row.getString(1) === "hello world")
    // a schema without ts is rejected at CREATE time
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad (x BIGINT, y STRING)")
    }
    spark.sql(s"DROP TABLE $cat.docs")
  }

  test("ts range SELECT prunes buckets on the V2 scan (BucketPruneRule)") {
    graft.core.Engine.installOptimizations(spark)
    val cat = freshCat("bucket" -> "day")
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, data BINARY)")
    spark.sql(s"INSERT INTO $cat.ev (key, ts, data) SELECT " +
      "CAST(id AS STRING), timestamp_micros(1704067200000000 + id * 86400000000), X'00' " +
      "FROM range(10)")
    val q = spark.sql(s"SELECT key, ts FROM $cat.ev " +
      "WHERE ts BETWEEN TIMESTAMP '2024-01-03 00:00:00' " +
      "AND TIMESTAMP '2024-01-05 23:59:59' ORDER BY ts")
    assert(q.count() === 3)
    q.collect()
    val scanned = graft.core.PlanMetrics.scannedFiles(
      q.queryExecution.executedPlan)
    assert(scanned === 3L,
      s"expected 3 of 10 day files scanned, got $scanned:\n" +
        q.queryExecution.executedPlan)
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("CALL system.* runs maintenance verbs through the facade and returns metrics") {
    val cat = freshCat("bucket" -> "day")
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, data BINARY)")
    // three inserts into the same day bucket → over the default
    // compactFileThreshold? (fullStats default threshold is 4) — use 5
    (1 to 5).foreach { i =>
      spark.sql(s"INSERT INTO $cat.ev (key, ts, data) VALUES " +
        s"('k$i', TIMESTAMP '2024-01-01 1$i:00:00', X'0$i')")
    }
    val compacted = spark.sql(s"CALL $cat.system.compact('ev')").head()
    assert(compacted.schema.fieldNames.toSeq === Seq("buckets_compacted"))
    assert(compacted.getLong(0) === 1L)
    // compaction preserved every row
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 5L)
    assert(spark.sql(s"CALL $cat.system.vacuum_orphans('ev')")
      .head().getLong(0) === 0L)
    assert(spark.sql(s"CALL $cat.system.rebuild_sidecars('ev')")
      .head().getLong(0) === 1L)
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.truncate_everything('ev')").collect()
    }
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("SQL DELETE FROM: key route, generic predicate route, refusal, TRUNCATE") {
    val cat = freshCat("bucket" -> "day")
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, data BINARY)")
    spark.sql(s"INSERT INTO $cat.ev (key, ts, data) SELECT " +
      "CAST(id % 5 AS STRING), " +
      "timestamp_micros(1704067200000000 + id * 21600000000), X'00' " +
      "FROM range(40)") // 40 rows over 10 day buckets, keys 0..4
    // key-literal route (deleteKeys under the hood)
    spark.sql(s"DELETE FROM $cat.ev WHERE key = '3'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE key = '3'")
      .head().getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 32L)
    // generic predicate route (ts range + key disjunction)
    spark.sql(s"DELETE FROM $cat.ev WHERE ts < TIMESTAMP '2024-01-03 00:00:00' " +
      "OR key = '0'")
    val left = spark.sql(s"SELECT key, ts FROM $cat.ev ORDER BY ts, key").collect()
    assert(left.forall(r => r.getString(0) != "0" &&
      !r.getTimestamp(1).before(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))))
    assert(left.nonEmpty)
    // sidecars stayed consistent through both rewrites
    val dataDir = spark.conf.get(s"spark.sql.catalog.$cat.dataDir")
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(dataDir, bucket = "day"))
    try {
      assert(db.sidecarsConsistent("ev"))
      assert(db.stats("ev").numRows === left.length.toLong)
    } finally db.close()
    // a predicate that cannot translate to source filters is refused
    // loudly, and deletes nothing
    val before = spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0)
    intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.ev WHERE length(decode(data, 'UTF-8')) > 0")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === before)
    // TRUNCATE = the delete-everything degenerate case
    spark.sql(s"TRUNCATE TABLE $cat.ev")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 0L)
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("multi-namespace: CREATE NAMESPACE zones with own locks; cross-namespace SHOW/DML") {
    val cat = freshCat("bucket" -> "day")
    spark.sql(s"CREATE NAMESPACE $cat.raw")
    spark.sql(s"CREATE NAMESPACE $cat.curated")
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).toSet === Set("default", "raw", "curated"))
    // tables in default and in a zone; the zone dir is NOT a table
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, v BIGINT)")
    spark.sql(s"CREATE TABLE $cat.raw.docs (doc_id BIGINT, ts TIMESTAMP, text STRING)")
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSeq === Seq("ev"))
    assert(spark.sql(s"SHOW TABLES IN $cat.raw").collect()
      .map(_.getString(1)).toSeq === Seq("docs"))
    // full verb surface inside the zone: INSERT / SELECT / DELETE / CALL
    spark.sql(s"INSERT INTO $cat.raw.docs (doc_id, ts, text) VALUES " +
      "(1, TIMESTAMP '2024-01-01 10:00:00', 'a')," +
      "(2, TIMESTAMP '2024-01-02 10:00:00', 'b')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.raw.docs").head().getLong(0) === 2L)
    spark.sql(s"DELETE FROM $cat.raw.docs WHERE doc_id = 2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.raw.docs").head().getLong(0) === 1L)
    assert(spark.sql(s"CALL $cat.system.vacuum_orphans('raw.docs')")
      .head().getLong(0) === 0L)
    // zones lock independently: a facade holding the DEFAULT root's
    // lock must not block zone DML
    val dataDir = spark.conf.get(s"spark.sql.catalog.$cat.dataDir")
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(dataDir, bucket = "day"))
    try spark.sql(s"INSERT INTO $cat.raw.docs (doc_id, ts, text) VALUES " +
      "(3, TIMESTAMP '2024-01-03 10:00:00', 'c')")
    finally db.close()
    assert(spark.sql(s"SELECT count(*) FROM $cat.raw.docs").head().getLong(0) === 2L)
    // non-empty namespace refuses a bare DROP; CASCADE drops through
    // the facade's delete protocol
    intercept[Exception] { spark.sql(s"DROP NAMESPACE $cat.raw") }
    spark.sql(s"DROP NAMESPACE $cat.raw CASCADE")
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).toSet === Set("default", "curated"))
    spark.sql(s"DROP NAMESPACE $cat.curated")
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("ALTER TABLE RENAME: sidecars and pins travel, twin rebuilds, cross-ns refused") {
    val cat = freshCat()
    spark.sql(s"CREATE TABLE $cat.old (key STRING, ts TIMESTAMP, v BIGINT) " +
      "TBLPROPERTIES ('bucket'='day', 'ttl'='2000d')")
    spark.sql(s"INSERT INTO $cat.old (key, ts, v) SELECT CAST(id AS STRING), " +
      "timestamp_micros(1704067200000000 + id * 86400000000), id FROM range(6)")
    // the TO identifier is CATALOG-RELATIVE (Spark hands the connector
    // whatever trails the catalog) — plain `fresh` or `default.fresh`
    spark.sql(s"ALTER TABLE $cat.old RENAME TO fresh")
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSeq === Seq("fresh"))
    // data, typed schema, and the DAY pin (bucket labels) traveled
    assert(spark.sql(s"SELECT count(*) FROM $cat.fresh").head().getLong(0) === 6L)
    assert(spark.table(s"$cat.fresh").columns.toSeq ===
      Seq("key", "ts", "v", "bucket"))
    assert(spark.sql(s"SELECT bucket FROM $cat.fresh LIMIT 1")
      .head().getString(0).length === 10) // day label
    // SHOW TBLPROPERTIES observability: pins visible from SQL
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.fresh").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("bucket").contains("day"))
    assert(props.get("ttl").contains(s"${2000L * 86400}s"))
    // the declared TTL pin traveled too (facade view of the new name)
    val dataDir = spark.conf.get(s"spark.sql.catalog.$cat.dataDir")
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(dataDir, bucket = "day"))
    try {
      assert(db.ttlFor("fresh") === Some(2000L * 86400))
      assert(db.manifestConsistent("fresh") && db.sidecarsConsistent("fresh"))
    } finally db.close()
    // old name gone; rename onto an existing table refused
    intercept[Exception] { spark.sql(s"SELECT * FROM $cat.old").collect() }
    spark.sql(s"CREATE TABLE $cat.other (key STRING, ts TIMESTAMP, v BIGINT)")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.fresh RENAME TO other")
    }
    // cross-namespace refusal, loudly
    spark.sql(s"CREATE NAMESPACE $cat.zone")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.fresh RENAME TO zone.fresh")
    }
    assert(e.getMessage.contains("backup/restore"))
    spark.sql(s"DROP NAMESPACE $cat.zone")
    spark.sql(s"DROP TABLE $cat.fresh"); spark.sql(s"DROP TABLE $cat.other")
  }

  test("rename invalidates the bucketed twin wholesale; next rebuild serves the new path") {
    val dir = Files.createTempDirectory("rename_twin").toString
    val db = new graft.core.ChronoDB(spark, graft.core.ChronoConfig(dir,
      bucket = "day", keyBuckets = 4))
    try {
      import spark.implicits._
      db.createTable("t")
      db.insertSeq("t", (0 until 8).map(i => graft.core.ChronoRow(s"k$i",
        java.sql.Timestamp.valueOf(f"2024-01-0${i % 3 + 1} 10:00:00"),
        Array[Byte](1))))
      db.rebuildBucketed("t")
      assert(db.bucketedTable("t").count() === 8L)
      db.renameTable("t", "t2")
      assert(db.table("t2").count() === 8L)
      intercept[Exception](db.table("t"))
      // the twin was dropped with the rename — a fresh rebuild works
      // under the new name/path
      assert(db.refreshBucketed("t2").mode === "rebuild")
      assert(db.bucketedTable("t2").count() === 8L)
    } finally db.close()
  }

  test("ADVICE r16: an invalid catalog bucket option fails at initialize, not first write") {
    val cat = freshCat("bucket" -> "daily")
    val e = intercept[Exception] {
      spark.sql(s"SHOW TABLES IN $cat").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      t.getMessage != null && t.getMessage.contains("bucket must be hour|day")))
  }

  test("INSERT OVERWRITE and PARTITIONED BY are rejected; DML honors the LOCK") {
    val cat = freshCat("bucket" -> "day")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.p (key STRING, ts TIMESTAMP) " +
        "PARTITIONED BY (key)")
    }
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, data BINARY)")
    intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $cat.ev (key, ts, data) VALUES " +
        "('a', TIMESTAMP '2024-01-01 10:00:00', X'01')")
    }
    // a facade holding the data-dir LOCK blocks catalog DML (single-
    // writer contract, same as every write path)
    val dataDir = spark.conf.get(s"spark.sql.catalog.$cat.dataDir")
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(dataDir, bucket = "day"))
    try {
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $cat.ev (key, ts, data) VALUES " +
          "('a', TIMESTAMP '2024-01-01 10:00:00', X'01')")
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(
        _.isInstanceOf[graft.core.DatabaseLockedException]))
      // READS never needed the lock: SHOW TABLES and SELECT still work
      // while the facade holds the data dir
      assert(spark.sql(s"SHOW TABLES IN $cat").collect()
        .map(_.getString(1)).toSeq === Seq("ev"))
      assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 0L)
    } finally db.close()
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF, history procedure, snapshots read-only") {
    val cat = freshCat("bucket" -> "day", "trashGrace" -> "1h")
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, data BINARY)")
    spark.sql(s"INSERT INTO $cat.ev (key, ts, data) VALUES " +
      "('a', TIMESTAMP '2024-01-01 10:00:00', X'01')," +
      "('b', TIMESTAMP '2024-01-02 11:00:00', X'02')")          // v1
    Thread.sleep(20)
    spark.sql(s"INSERT INTO $cat.ev (key, ts, data) VALUES " +
      "('c', TIMESTAMP '2024-01-03 12:00:00', X'03')")          // v2
    spark.sql(s"DELETE FROM $cat.ev WHERE key = 'a'")           // v3
    // history procedure: one row per verb, newest first
    val h = spark.sql(s"CALL $cat.system.history('ev')").collect()
    assert(h.map(_.getString(2)).toSeq ===
      Seq("delete", "insert", "insert", "baseline"))
    assert(h.map(_.getLong(0)).toSeq === Seq(3L, 2L, 1L, 0L))
    // VERSION AS OF reconstructs each state
    def keysAt(q: String): Set[String] =
      spark.sql(q).collect().map(_.getString(0)).toSet
    assert(keysAt(s"SELECT key FROM $cat.ev VERSION AS OF 1") === Set("a", "b"))
    assert(keysAt(s"SELECT key FROM $cat.ev VERSION AS OF 2") ===
      Set("a", "b", "c"))
    assert(keysAt(s"SELECT key FROM $cat.ev VERSION AS OF 3") === Set("b", "c"))
    assert(keysAt(s"SELECT key FROM $cat.ev") === Set("b", "c"))
    // TIMESTAMP AS OF: between v1 and v2 resolves to v1 (the analyzer
    // passes micros — resolution semantics pinned end-to-end here)
    val (e1, e2) = (h.find(_.getLong(0) == 1L).get.getTimestamp(1).getTime,
      h.find(_.getLong(0) == 2L).get.getTimestamp(1).getTime)
    assert(e2 > e1)
    // render the literal in the session timezone (Timestamp.toString
    // would use the JVM default zone — wrong on a non-UTC host)
    val mid = java.time.Instant.ofEpochMilli((e1 + e2) / 2)
      .atZone(java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone))
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(keysAt(s"SELECT key FROM $cat.ev TIMESTAMP AS OF '$mid'") ===
      Set("a", "b"))
    // snapshots refuse every mutating surface — and refuse WITHOUT
    // touching state (v1 and the live table read the same after)
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ev VERSION AS OF 1 VALUES " +
        "('z', TIMESTAMP '2024-01-09 00:00:00', X'09', '2024-01-09')")
    }
    intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.ev VERSION AS OF 1 WHERE key = 'a'")
    }
    assert(keysAt(s"SELECT key FROM $cat.ev VERSION AS OF 1") === Set("a", "b"))
    assert(keysAt(s"SELECT key FROM $cat.ev") === Set("b", "c"))
    // a non-numeric version is refused with the catalog's own message
    val bad = intercept[Exception] {
      spark.sql(s"SELECT key FROM $cat.ev VERSION AS OF 'abc'").collect()
    }
    assert(bad.getMessage.contains("numeric commit versions"))
    // the table-level guards themselves (SQL may refuse earlier at
    // parse/analysis — this pins the LAST line of defense directly)
    val tcat = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val snapT = tcat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "ev"), "1").asInstanceOf[ChronoV2Table]
    assert(snapT.isSnapshot)
    assert(intercept[UnsupportedOperationException] {
      snapT.newWriteBuilder(null)
    }.getMessage.contains("read-only"))
    assert(intercept[UnsupportedOperationException] {
      snapT.deleteWhere(Array.empty[org.apache.spark.sql.sources.Filter])
    }.getMessage.contains("read-only"))
    assert(!snapT.canDeleteWhere(
      Array.empty[org.apache.spark.sql.sources.Filter]))
    assert(!snapT.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.V1_BATCH_WRITE))
  }

  test("time travel survives compact (grace retains superseded files)") {
    val cat = freshCat("bucket" -> "day", "trashGrace" -> "1h")
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, data BINARY)")
    (1 to 5).foreach { i =>
      spark.sql(s"INSERT INTO $cat.ev (key, ts, data) VALUES " +
        s"('k$i', TIMESTAMP '2024-01-01 0$i:00:00', X'0$i')")
    }                                       // v1..v5 (threshold 4 → victim)
    spark.sql(s"CALL $cat.system.compact('ev')")                 // v6
    val h = spark.sql(s"CALL $cat.system.history('ev')").head()
    assert(h.getString(2) === "compact" && h.getLong(0) === 6L)
    // every pre-compact version still reads its own file set
    (1 to 5).foreach { v =>
      assert(spark.sql(
        s"SELECT count(*) FROM $cat.ev VERSION AS OF $v").head().getLong(0)
        === v.toLong, s"version $v")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 5L)
  }
}
