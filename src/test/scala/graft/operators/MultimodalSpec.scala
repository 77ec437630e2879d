package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "hello world"), (2L, "another payload")).toDF("id", "data"),
    "id", "data", "image/fake")

  test("asMedia produces binary payload with type tag") {
    val row = media.orderBy("media_id").head()
    assert(row.getAs[Array[Byte]]("payload") === "hello world".getBytes("UTF-8"))
    assert(row.getAs[String]("media_type") === "image/fake")
  }

  test("decodeMeta is deterministic and partition-parallel") {
    val out1 = Multimodal.decodeMeta(spark, media).orderBy("media_id").collect()
    val out2 = Multimodal.decodeMeta(spark, media.repartition(4))
      .orderBy("media_id").collect()
    assert(out1 === out2)
    val meta = out1(0).getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Int]("byte_len") === 11)
    assert(meta.getAs[Int]("width") >= 16)
  }

  test("extractFeatures emits fixed-dim float vectors consumable by Similarity") {
    val feats = Multimodal.extractFeatures(spark, media, dim = 8)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.forall(_.getAs[Seq[Float]]("embedding").length === 8))
    // deterministic across repartition (partition-parallel, no state)
    val again = Multimodal.extractFeatures(spark, media.repartition(3), dim = 8)
      .orderBy("media_id").collect()
    assert(rows === again)
    // flows straight into the ANN operator with no schema glue
    val topk = Similarity.bruteForceTopK(feats, feats.limit(1),
      "media_id", "embedding", k = 1)
    assert(topk.count() === 1)
  }

  test("resize shrinks payload by area ratio and stamps new dims") {
    val out = Multimodal.resize(spark, media, 16, 16).orderBy("media_id").collect()
    val orig = media.orderBy("media_id").collect()
    out.zip(orig).foreach { case (r, o) =>
      assert(r.getAs[Int]("width") === 16)
      assert(r.getAs[Int]("height") === 16)
      assert(r.getAs[Array[Byte]]("payload").length <=
        o.getAs[Array[Byte]]("payload").length)
    }
  }

  test("sampleFrames explodes frame indices with stride") {
    val meta = Multimodal.decodeMeta(spark, media)
    val frames = Multimodal.sampleFrames(meta, stride = 4)
    val perMedia = frames.groupBy("media_id").count().as[(Long, Long)]
      .collect().toMap
    val nFrames = meta.select($"media_id", $"meta.n_frames")
      .as[(Long, Int)].collect().toMap
    perMedia.foreach { case (id, n) =>
      assert(n === (nFrames(id) + 3) / 4)
    }
  }
}
