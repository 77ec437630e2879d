package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** `df.writeStream.toTable("cat.ev")` — the STREAMING_WRITE half of the
  * catalog streaming story (stage-then-adopt protocol,
  * [[ChronoStreamingWrite]]): executor-staged parquet adopted through
  * insertFrame per epoch, exactly-once via the per-query epoch log. */
class StreamingWriteSpec extends SparkSuite {

  private def freshCat(): (String, String) = {
    val dir = Files.createTempDirectory("swrite").toString
    val name = s"sw${System.nanoTime() % 1000000}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[ChronoCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.dataDir", dir)
    spark.conf.set(s"spark.sql.catalog.$name.bucket", "day")
    (name, dir)
  }

  test("writeStream.toTable lands micro-batches through the facade protocol") {
    val (cat, dir) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, v BIGINT)")
    // stage two landing files → two micro-batches (maxFilesPerTrigger=1)
    val landing = Files.createTempDirectory("swrite_landing")
    (0 until 2).foreach { i =>
      val tmp = Files.createTempDirectory(s"swb$i")
      spark.range(i * 5, i * 5 + 5).selectExpr("CAST(id AS STRING) AS key",
          "timestamp_micros(1704067200000000 + id * 86400000000) AS ts",
          "id AS v")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/d")
      val part = new java.io.File(s"$tmp/d").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, landing.resolve(f"batch$i%03d.parquet"))
    }
    val q = spark.readStream
      .schema("key STRING, ts TIMESTAMP, v BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(landing.toString)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("swrite_cp").toString)
      .toTable(s"$cat.ev")
    q.processAllAvailable(); q.stop()
    // all rows landed, exactly once, through the full sidecar protocol
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 10L)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ev").head().getLong(0) === 45L)
    val db = new graft.core.ChronoDB(spark,
      graft.core.ChronoConfig(dir, bucket = "day"))
    try {
      assert(db.manifestConsistent("ev") && db.sidecarsConsistent("ev"))
    } finally db.close()
    // staging cleaned up
    val staging = java.nio.file.Paths.get(dir, "ev", "_staging")
    assert(!java.nio.file.Files.exists(staging) ||
      java.nio.file.Files.list(staging).toArray.forall(p =>
        java.nio.file.Files.list(p.asInstanceOf[java.nio.file.Path])
          .toArray.isEmpty))
    spark.sql(s"DROP TABLE $cat.ev")
  }

  test("epoch replay is skipped (exactly-once), direct-commit unit check") {
    val (cat, dir) = freshCat()
    spark.sql(s"CREATE TABLE $cat.ev (key STRING, ts TIMESTAMP, v BIGINT)")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("key", StringType),
      StructField("ts", TimestampType), StructField("v", LongType)))
    val tableRoot = new org.apache.hadoop.fs.Path(s"file:$dir/ev")
    val w = new ChronoStreamingWrite(spark, tableRoot, "ev",
      graft.core.ChronoConfig(s"$dir", bucket = "day"), schema, "q-test")
    // stage one file by hand (what an executor DataWriter produces)
    val staged = s"$dir/ev/_staging/q-test/7/part-7-0-0.parquet"
    spark.range(3).selectExpr("CAST(id AS STRING) AS key",
        "timestamp_micros(1704067200000000 + id * 86400000000) AS ts",
        "id AS v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_tmp7")
    val part = new java.io.File(s"$dir/_tmp7").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/ev/_staging/q-test/7"))
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(staged))
    val msgs = Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      ChronoStagedFile(staged))
    w.commit(7L, msgs)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 3L)
    // re-delivered epoch: adopted files are gone AND the epoch is logged
    // — the commit must SKIP, not fail or double-insert
    w.commit(7L, msgs)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").head().getLong(0) === 3L)
    spark.sql(s"DROP TABLE $cat.ev")
  }
}
