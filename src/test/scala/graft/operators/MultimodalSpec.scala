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

  test("ImageCodec PNG round-trip is pixel-exact (real javax.imageio)") {
    val png = Multimodal.ImageCodec.synthPng(7L, 32, 32)
    // real PNG magic bytes — proves the real encoder ran
    assert(png.take(4) === Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 32 && img.getHeight === 32)
    for (y <- 0 until 32; x <- 0 until 32) {
      val p = img.getRGB(x, y)
      val (r, g, b) = Multimodal.ImageCodec.synthRgb(7L, x, y)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((r, g, b)),
        s"pixel ($x,$y) diverged after the PNG round-trip")
    }
  }

  test("aHash/dHash match hand-computed values on a known grid") {
    // 2x2-ish reasoning on an 8x8 grid: cells 0..63 ascending → mean =
    // (0+..+63)/64 = 31 (floor 2016/64 = 31.5 → 31); aHash bits set for
    // cells 32..63; dHash: every horizontal neighbor increases → all 56
    // bits set
    val asc = Array.tabulate(64)(i => i)
    assert(Multimodal.ImageCodec.aHash64(asc) === (0xFFFFFFFFL << 32))
    assert(Multimodal.ImageCodec.dHash56(asc) === ((1L << 56) - 1))
    // constant grid: no cell > mean, no neighbor strictly less
    val const = Array.fill(64)(5)
    assert(Multimodal.ImageCodec.aHash64(const) === 0L)
    assert(Multimodal.ImageCodec.dHash56(const) === 0L)
  }

  test("imageHashes decodes real PNGs partition-parallel and agrees with direct computation") {
    val ids = (1L to 20L).toDF("doc_id")
    val out = Multimodal.imageHashes(
        Multimodal.synthImages(ids, "doc_id", 32, 32))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.size === 20)
    (1L to 20L).foreach { id =>
      val (_, _, cells) = Multimodal.ImageCodec.lumaGrid(
        Multimodal.ImageCodec.synthPng(id, 32, 32), 8)
      assert(out(id) === ((32, 32,
        Multimodal.ImageCodec.aHash64(cells),
        Multimodal.ImageCodec.dHash56(cells))))
    }
  }

  test("jpegRoundTrip: real lossy encode survives verdicts; direct check agrees") {
    val ids = (1L to 20L).toDF("doc_id")
    val out = Multimodal.jpegRoundTrip(
        Multimodal.synthImages(ids, "doc_id", 32, 32),
        quality = 0.85f, cellErrTol = 8, hamTol = 6)
      .collect()
    assert(out.length === 20)
    out.foreach { r =>
      assert(r.getInt(1) === 32 && r.getInt(2) === 32)
      (3 to 7).foreach(i => assert(r.getBoolean(i), s"verdict col $i on id ${r.getLong(0)}"))
    }
    // direct single-image check: the lossy decode really differs from
    // the lossless pixels (the codec is doing lossy work, the verdicts
    // aren't vacuous) yet stays within the declared tolerance
    val totalErr = (1L to 20L).map { id =>
      val png = Multimodal.ImageCodec.synthPng(id, 32, 32)
      val (_, _, pc) = Multimodal.ImageCodec.lumaGrid(png, 8)
      val jpeg = Multimodal.ImageCodec.encodeJpeg(png, 0.85f)
      val (jw, jh, jc) = Multimodal.ImageCodec.lumaGrid(jpeg, 8)
      assert(jw === 32 && jh === 32)
      val errs = pc.zip(jc).map { case (a, b) => math.abs(a - b) }
      assert(errs.max <= 8)
      errs.sum
    }.sum
    assert(totalErr > 0, "JPEG at q=0.85 should not be grid-identical to PNG on every image")
  }

  test("AudioCodec WAV round-trip is sample-exact (real javax.sound.sampled)") {
    val samples = Multimodal.AudioCodec.synthSamples(7L, 500)
    val wav = Multimodal.AudioCodec.encodeWav(samples, 8000)
    // a real RIFF/WAVE container, not a raw byte dump
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val (rate, back) = Multimodal.AudioCodec.decodeWav(wav)
    assert(rate === 8000)
    assert(back === samples)
    // extreme values survive the container (signed 16-bit edges)
    val edges = Array(Short.MinValue, Short.MaxValue, 0.toShort, (-1).toShort)
    val (_, edgesBack) = Multimodal.AudioCodec.decodeWav(
      Multimodal.AudioCodec.encodeWav(edges, 44100))
    assert(edgesBack === edges)
  }

  test("VideoContainer ISO-BMFF write→walk→parse round-trips every synthesized field") {
    (0L to 40L).foreach { id =>
      val bytes = Multimodal.VideoContainer.synthMp4(id)
      val (ts, dur, w, h, mdat) = Multimodal.VideoContainer.synthFields(id)
      val m = Multimodal.VideoContainer.parse(bytes)
      assert(m.majorBrand === "isom")
      assert(m.timescale === ts)
      assert(m.duration === dur.toLong)
      assert(m.trackId === 1L)
      assert(m.width === w)
      assert(m.height === h)
      assert(m.mdatBytes === mdat.toLong)
      assert(m.nBoxes === 6)
    }
  }

  test("VideoContainer walker handles largesize, size-0 and unknown boxes per the spec") {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    // unknown box (skipped by size), a largesize box (size==1 + 64-bit),
    // then a size-0 box extending to end of file
    val unknown = be32(12L) ++ "xyz ".getBytes("US-ASCII") ++ be32(7L)
    val large = be32(1L) ++ "skip".getBytes("US-ASCII") ++ be64(19L) ++ Array[Byte](1, 2, 3)
    val toEnd = be32(0L) ++ "mdat".getBytes("US-ASCII") ++ Array[Byte](9, 9, 9, 9, 9)
    val boxes = Multimodal.VideoContainer.walkBoxes(unknown ++ large ++ toEnd)
    assert(boxes.map(_._1) === Seq("xyz ", "skip", "mdat"))
    assert(boxes(1)._3 === 3L, "largesize payload = 19 - 16-byte header")
    assert(boxes(2)._3 === 5L, "size-0 box extends to end of scope")
    // malformed: declared size overruns the file
    val bad = be32(64L) ++ "free".getBytes("US-ASCII") ++ Array[Byte](0)
    intercept[IllegalArgumentException] {
      Multimodal.VideoContainer.walkBoxes(bad)
    }
  }

  test("videoMeta extracts container metadata partition-parallel") {
    val ids = (1L to 20L).toDF("doc_id")
    val out = Multimodal.videoMeta(
        Multimodal.synthVideos(ids.repartition(4), "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 20)
    (1L to 20L).foreach { id =>
      val (ts, dur, w, h, mdat) = Multimodal.VideoContainer.synthFields(id)
      val r = out(id)
      assert(r.getString(1) === "isom")
      assert(r.getInt(2) === ts)
      assert(r.getLong(3) === dur.toLong)
      assert(r.getLong(4) === dur.toLong * 1000L / ts)
      assert(r.getLong(5) === 1L)
      assert(r.getInt(6) === w && r.getInt(7) === h)
      assert(r.getLong(8) === mdat.toLong)
      assert(r.getInt(9) === 6)
    }
  }

  test("audioFeatures agrees with direct per-sample computation, partition-parallel") {
    val ids = (1L to 20L).toDF("doc_id")
    val out = Multimodal.audioFeatures(
        Multimodal.synthAudio(ids.repartition(4), "doc_id", 8000, 2000))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out.size === 20)
    (1L to 20L).foreach { id =>
      val s = Multimodal.AudioCodec.synthSamples(id, 2000)
      val peak = s.map(v => math.abs(v.toInt)).max
      val zc = (1 until s.length)
        .count(i => (s(i - 1) < 0) != (s(i) < 0)).toLong
      val energy = s.map(v => v.toLong * v).sum
      assert(out(id) === ((8000, 2000, 250L, peak, zc, energy)))
    }
  }
}
