package graft.core

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Schema-fidelity contract of the driver-side sidecar parquet writer
  * (r21): files written by [[SidecarIO]] and by Spark must be
  * INTERCHANGEABLE — one explicit read schema, lossless folds over
  * mixed-fragment dirs, byte-exact binary sketch columns. This is the
  * spec whose absence deferred the driver-side writer in r20. */
class SidecarIoSpec extends SparkSuite {

  private def tmpDir(tag: String): HPath =
    new HPath(java.nio.file.Files.createTempDirectory(tag).toString)

  private lazy val hconf = spark.sessionState.newHadoopConf()
  private lazy val cfs =
    ChronoFs.resolve(java.nio.file.Files.createTempDirectory("sio").toString,
      hconf)._1

  // the `_stats` sidecar schema: the binary + array families
  private val statsSchema = StructType(Seq(
    StructField("bucket", StringType, nullable = false),
    StructField("sketch", BinaryType, nullable = true),
    StructField("n", LongType, nullable = false),
    StructField("counters", ArrayType(LongType, containsNull = false),
      nullable = true),
    StructField("key_min", StringType, nullable = true),
    StructField("key_max", StringType, nullable = true),
    StructField("bloom", BinaryType, nullable = true)))

  private val manifestSchema = StructType(Seq(
    StructField("bucket", StringType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mtime", LongType, nullable = false)))

  private val annSchema = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("center", ArrayType(FloatType, containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("id_col", StringType, nullable = false),
    StructField("vec_col", StringType, nullable = false),
    StructField("nlist", IntegerType, nullable = false),
    StructField("seed", LongType, nullable = false),
    StructField("built_version", LongType, nullable = false)))

  test("stats roundtrip: binaries byte-exact, nulls, empty arrays") {
    val dir = tmpDir("sio_stats")
    val sketch = Array[Byte](1, 2, -3, 127, -128, 0, 42)
    val bloom = Array.tabulate(64)(i => (i * 7 - 100).toByte)
    val rows = Seq(
      Row("2024-01-01", sketch, 5L, Seq(1L, 0L, 9L), "a", "z", bloom),
      Row("2024-01-02", null, 0L, Seq.empty[Long], null, null, null),
      Row("2024-01-03", Array.empty[Byte], 7L, null, "m", "m", null))
    SidecarIO.appendRows(cfs, hconf, dir, statsSchema, rows, "zstd")
    val back = spark.read.schema(statsSchema).parquet(dir.toString)
      .orderBy("bucket").collect()
    assert(back.length == 3)
    assert(back(0).getAs[Array[Byte]]("sketch").sameElements(sketch))
    assert(back(0).getAs[Array[Byte]]("bloom").sameElements(bloom))
    assert(back(0).getSeq[Long](3) == Seq(1L, 0L, 9L))
    assert(back(0).getString(4) == "a" && back(0).getString(5) == "z")
    assert(back(1).isNullAt(1) && back(1).isNullAt(4) && back(1).isNullAt(6))
    // empty array is EMPTY, not null — the LIST-group encoding detail
    assert(!back(1).isNullAt(3) && back(1).getSeq[Long](3).isEmpty)
    assert(back(2).getAs[Array[Byte]]("sketch").isEmpty)
    assert(back(2).isNullAt(3))
  }

  test("mixed dir: Spark-written and driver-written fragments fold together") {
    val dir = tmpDir("sio_mixed")
    import scala.jdk.CollectionConverters._
    val sparkRows = Seq(Row("b1", "f1.parquet", 10L, 1000L),
      Row("b2", "f2.parquet", 20L, 2000L))
    spark.createDataFrame(
        new java.util.ArrayList[Row](sparkRows.asJava), manifestSchema)
      .coalesce(1).write.mode("append").option("compression", "zstd")
      .parquet(dir.toString)
    val drvRows = Seq(Row("b1", "f3.parquet", 30L, 3000L),
      Row("b3", "f4.parquet", 40L, 4000L))
    SidecarIO.appendRows(cfs, hconf, dir, manifestSchema, drvRows, "zstd")
    val folded = spark.read.schema(manifestSchema).parquet(dir.toString)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(folded == Set(("b1", "f1.parquet", 10L, 1000L),
      ("b2", "f2.parquet", 20L, 2000L), ("b1", "f3.parquet", 30L, 3000L),
      ("b3", "f4.parquet", 40L, 4000L)))
    // schema INFERENCE (no explicit schema) also agrees across the mix
    val inferred = spark.read.parquet(dir.toString)
    assert(inferred.columns.toSeq == Seq("bucket", "file", "size", "mtime"))
    assert(inferred.count() == 4)
  }

  test("ann meta roundtrip: float arrays exact, int/long fields") {
    val dir = tmpDir("sio_ann")
    val center = Seq(0.5f, -1.25f, 3.14159f, Float.MinPositiveValue)
    val rows = Seq(Row(0, center, 42L, "id", "vec", 4, 7L, 3L),
      Row(1, Seq(1f, 2f, 3f, 4f), 0L, "id", "vec", 4, 7L, 3L))
    SidecarIO.appendRows(cfs, hconf, dir, annSchema, rows, "zstd")
    val back = spark.read.schema(annSchema).parquet(dir.toString)
      .orderBy("cell").collect()
    assert(back(0).getSeq[Float](1) == center)
    assert(back(0).getInt(0) == 0 && back(0).getLong(2) == 42L)
    assert(back(1).getInt(5) == 4 && back(1).getLong(6) == 7L)
  }

  test("staged dir carries _SUCCESS and reads back whole") {
    val stage = tmpDir("sio_stage").suffix(".tmp")
    SidecarIO.writeStagedDir(cfs, hconf, stage, manifestSchema,
      Seq(Row("b", "f.parquet", 1L, 2L)), "zstd")
    assert(cfs.exists(new HPath(stage, "_SUCCESS")))
    assert(spark.read.schema(manifestSchema).parquet(stage.toString)
      .count() == 1)
  }

  test("append is invisible until complete: no half-visible fragment names") {
    // the staged name is dot-prefixed (hidden) and the final name ends
    // .parquet — the listing conventions every sidecar reader keys on
    val dir = tmpDir("sio_names")
    SidecarIO.appendRows(cfs, hconf, dir, manifestSchema,
      Seq(Row("b", "f.parquet", 1L, 2L)), "zstd")
    val names = cfs.list(dir).map(_.getPath.getName)
    assert(names.exists(n => n.startsWith("part-") && n.endsWith(".parquet")))
    assert(!names.exists(_.endsWith(".tmp")))
  }
}
