package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2c D5): media as opaque
  * `BinaryType` payloads plus a typed metadata struct, processed with
  * `mapPartitions` over a batch-shaped iterator (the Scala analog of the
  * arrow-batch UDF path).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[FakeDecoder]] derives deterministic pseudo-metadata
  * from the payload bytes. The Spark-side contract — schema, binary
  * transport, partition-parallel decode, per-partition batching — is
  * real and tested; swapping [[FakeDecoder.decode]] for a real codec
  * changes no plan shape.
  */
object Multimodal {

  /** Media row: payload + typed metadata (what a real pipeline would
    * carry for images/audio/video). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("media_type", StringType),
    StructField("meta", StructType(Seq(
      StructField("byte_len", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** STUB codec — deterministic fake decode: metadata derived from
    * payload bytes only, so results are reproducible and testable. A
    * real deployment replaces this object with an actual decoder. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Int) = {
      val len = payload.length
      // Deterministic pseudo-dimensions from a rolling byte hash.
      var h = 1125899906842597L
      var i = 0
      while (i < math.min(len, 256)) { h = 31 * h + payload(i); i += 1 }
      val w = 16 + math.floorMod(h, 240).toInt
      val ht = 16 + math.floorMod(h >>> 8, 240).toInt
      val frames = 1 + math.floorMod(h >>> 16, 32).toInt
      (len, w, ht, frames)
    }
  }

  /** Wrap any (id, string-payload) table as media rows — used to drive
    * the pipeline with the documents fixture standing in for real bytes. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      lit(mediaType).as("media_type"))

  /** Partition-parallel decode: mapPartitions over binary payloads,
    * emitting the typed metadata struct. Batch shape = one partition's
    * iterator; no driver collection, no shuffle. */
  def decodeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(mediaSchema.fields.filterNot(_.name == "payload"))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"), col("media_type"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (len, w, h, f) = FakeDecoder.decode(payload)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"),
            Row(len, w, h, f))
        }
      }(enc)
  }

  /** Frame sampling stub: every `stride`-th frame index up to n_frames —
    * the plan shape of video frame extraction (explode of a bounded
    * sequence, partition-local). */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(stride))).as("frame_idx"))

  /** Feature-extraction stub: payload → fixed-`dim` float vector
    * (deterministic pseudo-embedding from payload bytes; a real pipeline
    * swaps in a vision/audio encoder). Output column `embedding` is
    * `ArrayType(FloatType)` — the exact shape the Similarity/Dedup
    * operators consume, so media rows flow straight into ANN search and
    * embedding near-dup with no schema glue. Partition-parallel, no
    * shuffle. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          var h = 1125899906842597L
          var i = 0
          while (i < math.min(payload.length, 256)) { h = 31 * h + payload(i); i += 1 }
          // double math with ONE rounding point (the final float cast) —
          // any engine replicating this (see the d5b oracle, which
          // emulates the signed-64 wrap in HUGEINT) lands on the same
          // float32 bits
          val vec = Array.tabulate(dim) { d =>
            val hd = h * (d * 2 + 1) + d
            ((math.floorMod(hd, 2001L).toDouble / 1000.0) - 1.0).toFloat
          }
          Row(r.getAs[Long]("media_id"), vec.toSeq)
        }
      }(enc)
  }

  /** Resize stub: the plan shape of image resizing — a partition-local
    * payload → payload transform plus updated metadata dims. The fake
    * "resize" truncates the payload proportionally to the area ratio so
    * output sizes are deterministic and assertable; a real pipeline swaps
    * the body for an actual scaler. */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"), col("media_type"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (_, ow, oh, _) = FakeDecoder.decode(payload)
          val ratio = math.min(1.0, (w.toDouble * h) / (ow.toDouble * oh))
          val newLen = math.max(1, (payload.length * ratio).toInt)
          Row(r.getAs[Long]("media_id"), payload.take(newLen),
            r.getAs[String]("media_type"), w, h)
        }
      }(enc)
  }
}
