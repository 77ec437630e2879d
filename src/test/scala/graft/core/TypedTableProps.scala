package graft.core

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Generative coverage for the typed-table contract: for RANDOM
  * declared schemas (ts required; optional key; 0–4 payload columns of
  * mixed types) and random row sets, insertFrame → table() round-trips
  * exactly — whatever the column order of the incoming frame, and with
  * a nullable payload column missing (NULL-filled, the evolution
  * write-compat promise). */
object TypedTableProps extends Properties("typedtable") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.ChronoDmlExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val payloadTypes: Gen[DataType] = Gen.oneOf(
    StringType, LongType, IntegerType, DoubleType, BooleanType)

  private val schemaGen: Gen[StructType] = for {
    nPay <- Gen.choose(0, 4)
    types <- Gen.listOfN(nPay, payloadTypes)
    keyed <- Gen.oneOf(true, false)
  } yield StructType(
    (if (keyed) Seq(StructField("key", StringType)) else Nil) ++
      Seq(StructField("ts", TimestampType)) ++
      types.zipWithIndex.map { case (t, i) => StructField(s"c$i", t) })

  private def valueFor(t: DataType, seed: Int): Any = t match {
    case StringType => s"v$seed"
    case LongType => seed.toLong * 7L
    case IntegerType => seed * 3
    case DoubleType => seed * 0.5
    case BooleanType => seed % 2 == 0
    case TimestampType => Timestamp.valueOf(
      f"2024-01-${1 + seed % 28}%02d ${seed % 24}%02d:00:00")
    case other => sys.error(s"unexpected $other")
  }

  property("insertFrame round-trips any schema under column reorder; missing payload NULL-fills") =
    forAll(schemaGen, Gen.choose(1, 10)) { (schema, nRows) =>
      val dir = Files.createTempDirectory("typedprop").toString
      val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
        sketchLgK = 0, sketchCmsDepth = 0, sketchBloomKeys = 0,
        writersPerBucket = 1))
      try {
        db.createTable("t", schema)
        val rows = (0 until nRows).map { i =>
          Row.fromSeq(schema.fields.toSeq.map(f =>
            valueFor(f.dataType, i * 31 + (f.name.hashCode.abs % 97))))
        }
        // hand the frame over with the columns REVERSED — alignment is
        // by name, never by position
        val scrambled = schema.fields.toSeq.reverse
        val scrambledRows = rows.map(r => Row.fromSeq(
          scrambled.map(f => r.get(schema.fieldIndex(f.name)))))
        val df = spark.createDataFrame(
          new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(scrambledRows).asJava),
          StructType(scrambled))
        db.insertFrame("t", df)
        val back = db.table("t").drop("bucket")
        val columnsOk = back.columns.toSeq == schema.fieldNames.toSeq
        val contentOk = back.collect().map(_.toSeq).toSet ==
          rows.map(_.toSeq).toSet
        // a missing nullable payload column NULL-fills on a second batch
        val payloads = schema.fieldNames.filterNot(n => n == "ts" || n == "key")
        val fillOk = payloads.headOption.forall { drop =>
          db.insertFrame("t", df.drop(drop))
          db.table("t").filter(col(drop).isNull).count() == nRows.toLong &&
            db.table("t").count() == 2L * nRows
        }
        columnsOk && contentOk && fillOk
      } finally db.close()
    }

  property("backup/restore round-trips typed tables through file:// URIs") =
    forAll(Gen.choose(1, 5)) { n =>
      val dir = Files.createTempDirectory("bak").toString
      val db = new ChronoDB(spark, ChronoConfig(dir, bucket = "day",
        writersPerBucket = 1))
      try {
        import spark.implicits._
        db.createTable("d", StructType(Seq(
          StructField("doc_id", LongType), StructField("ts", TimestampType),
          StructField("text", StringType))))
        db.insertFrame("d", (1 to n).map(i =>
            (i.toLong, Timestamp.valueOf(f"2024-01-$i%02d 10:00:00"), s"t$i"))
          .toDF("doc_id", "ts", "text"))
        // destination as an explicit file:// URI — the cross-filesystem
        // copy path (ChronoFs.resolve on the dst's own scheme)
        val dst = "file://" +
          Files.createTempDirectory("bakdst").toString + "/snap"
        db.backup("d", dst)
        db.restore("d", dst)
        val back = db.table("d")
        back.columns.toSeq == Seq("doc_id", "ts", "text", "bucket") &&
          back.count() == n.toLong &&
          db.tableSchema("d").fieldNames.toSeq == Seq("doc_id", "ts", "text") &&
          db.sidecarsConsistent("d")
      } finally db.close()
    }
}
