package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2c D5): media as opaque
  * `BinaryType` payloads plus a typed metadata struct, processed with
  * `mapPartitions` over a batch-shaped iterator (the Scala analog of the
  * arrow-batch UDF path).
  *
  * Codec status: the IMAGE path is REAL — [[ImageCodec]] encodes and
  * decodes PNG through `javax.imageio` (JDK-standard, no external
  * libraries) and [[imageHashes]] computes exact integer aHash/dHash
  * perceptual fingerprints from the decoded pixels (declared as d5f
  * with a pixel-exact DuckDB oracle — PNG is lossless, so the oracle
  * can recompute the same hashes from the generator formula without
  * decoding anything). The AUDIO path is REAL too — [[AudioCodec]]
  * writes and parses actual RIFF/WAVE PCM containers through
  * `javax.sound.sampled` (JDK-standard, headless-safe) and
  * [[audioFeatures]] computes exact integer signal features from the
  * decoded samples (declared as d5h; PCM in a WAV container is
  * lossless, so the DuckDB oracle recomputes the same features from
  * the sample formula without touching the container). Only the VIDEO
  * path remains stubbed ([[FakeDecoder]] derives deterministic
  * pseudo-metadata from payload bytes — no container/codec for it in
  * the JDK); its Spark-side contract — schema, binary transport,
  * partition-parallel decode — is identical to the real image/audio
  * paths', so swapping the stub for a codec changes no plan shape.
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

  /** REAL image codec — `javax.imageio` PNG encode/decode (JDK-standard;
    * the one raster codec this environment actually has). All pixel
    * math is EXACT integer arithmetic so every derived quantity is
    * oracle-expressible:
    *
    *  - `synthPng` renders a deterministic RGB test image (channel =
    *    small-integer formula of (id, x, y)) and encodes it through the
    *    real `ImageIO.write` — PNG is lossless, so a correct
    *    decode-side returns these exact pixel values;
    *  - `lumaGrid` decodes with the real `ImageIO.read` and reduces the
    *    raster to a `grid`×`grid` cell array: integer luma
    *    (299r+587g+114b)/1000, then integer block-average;
    *  - `aHash64` / `dHash56` are the standard average-/difference-hash
    *    perceptual fingerprints over that grid (dHash compares
    *    horizontal neighbors WITHIN the 8×8 grid — 56 bits — rather
    *    than resampling to 9×8, keeping one grid and one decode).
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    /** Deterministic per-channel pixel formula — small integers only,
      * replicated verbatim by the d5f DuckDB oracle. */
    def synthRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = (
      math.floorMod(id * 31 + x * 7 + y * 13, 256).toInt,
      math.floorMod(id * 17 + x * 11 + y * 5, 256).toInt,
      math.floorMod(id * 23 + x * 3 + y * 19, 256).toInt)

    /** Render the deterministic test image and PNG-encode it through
      * the REAL `javax.imageio` writer. */
    def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = synthRgb(id, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** REAL decode + exact integer luma grid. Returns (width, height,
      * cells row-major grid×grid). Requires the image dims to be
      * multiples of `grid` (block-average stays exact integer math). */
    def lumaGrid(png: Array[Byte], grid: Int): (Int, Int, Array[Int]) = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
      require(img != null,
        s"undecodable image payload (${png.length} bytes)")
      val w = img.getWidth; val h = img.getHeight
      require(w % grid == 0 && h % grid == 0,
        s"dims ${w}x$h not divisible by grid $grid")
      val bw = w / grid; val bh = h / grid
      val cells = new Array[Int](grid * grid)
      var cy = 0
      while (cy < grid) {
        var cx = 0
        while (cx < grid) {
          var s = 0L
          var y = cy * bh
          while (y < (cy + 1) * bh) {
            var x = cx * bw
            while (x < (cx + 1) * bw) {
              val p = img.getRGB(x, y)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
              val b = p & 0xff
              s += (299L * r + 587L * g + 114L * b) / 1000L
              x += 1
            }
            y += 1
          }
          cells(cy * grid + cx) = (s / (bw.toLong * bh)).toInt
          cx += 1
        }
        cy += 1
      }
      (w, h, cells)
    }

    /** Average hash: bit i set iff cell_i > floor(mean). 64 bits over
      * an 8×8 grid — the sign bit is real (signed-64 reinterpretation,
      * emulated HUGEINT-side by the oracle). */
    def aHash64(cells: Array[Int]): Long = {
      require(cells.length == 64, s"aHash needs 64 cells, got ${cells.length}")
      val mean = cells.map(_.toLong).sum / 64
      var h = 0L
      var i = 0
      while (i < 64) { if (cells(i) > mean) h |= (1L << i); i += 1 }
      h
    }

    /** REAL JPEG encode through `javax.imageio` at an explicit quality
      * — the LOSSY half of the codec story (PNG above is the lossless
      * half). Input is any payload the reader handles (we feed it the
      * PNG bytes); output is a baseline JPEG. The JDK encoder is
      * deterministic for fixed (pixels, quality) within a JVM, which
      * the d5g verdict checks explicitly rather than assumes. */
    def encodeJpeg(payload: Array[Byte], quality: Float): Array[Byte] = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null,
        s"undecodable image payload (${payload.length} bytes)")
      // JPEG has no alpha channel — redraw into TYPE_INT_RGB so the
      // writer never sees one, whatever raster type the reader chose
      val rgb = new BufferedImage(
        img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      val g2 = rgb.createGraphics()
      try g2.drawImage(img, 0, 0, null) finally g2.dispose()
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(rgb, null, null), param)
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Hamming distance between two 64-bit fingerprints. */
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    /** Difference hash within the 8×8 grid: bit (cy*7+cx) set iff
      * cell(cx,cy) < cell(cx+1,cy) — 56 bits, always non-negative. */
    def dHash56(cells: Array[Int]): Long = {
      require(cells.length == 64, s"dHash needs 64 cells, got ${cells.length}")
      var h = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 7) {
          if (cells(cy * 8 + cx) < cells(cy * 8 + cx + 1))
            h |= (1L << (cy * 7 + cx))
          cx += 1
        }
        cy += 1
      }
      h
    }
  }

  /** Deterministic REAL-PNG media rows for an id column: each id renders
    * the [[ImageCodec.synthRgb]] test pattern and encodes through the
    * real `ImageIO` PNG writer, partition-parallel. The image-pipeline
    * driver for fixtures that carry no image bytes of their own. */
  def synthImages(ids: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // positional getters: when two mapPartitions stages fuse (no
    // exchange between synth and decode), upstream rows arrive as
    // schemaless GenericRow — name-based access would throw
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, ImageCodec.synthPng(id, w, h))
        }
      }(enc)
  }

  /** REAL image decode + perceptual fingerprints over binary payloads:
    * (media_id, payload) → (media_id, width, height, ahash, dhash).
    * `javax.imageio` decode per row inside mapPartitions — partition-
    * parallel, no shuffle, no driver collection; at 100 TB this is the
    * same embarrassingly-parallel map stage as every decode pipeline,
    * bounded by codec throughput, not the engine. */
  def imageHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("ahash", LongType),
      StructField("dhash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          // positional getters — see synthImages' fusion note
          val (w, h, cells) =
            ImageCodec.lumaGrid(r.getAs[Array[Byte]](1), grid = 8)
          Row(r.getLong(0), w, h,
            ImageCodec.aHash64(cells), ImageCodec.dHash56(cells))
        }
      }(enc)
  }

  /** REAL image resize over binary payloads: decode through the real
    * `javax.imageio` reader, scale with an EXACT nearest-neighbor
    * kernel (src = (dst·srcDim)/dstDim in integer floor arithmetic —
    * hand-rolled, so the pixel mapping is spec-defined rather than a
    * library's rounding choice, and the d5j oracle can recompute every
    * output pixel from the generator formula), re-encode through the
    * real PNG writer (lossless — downstream decoders see exactly the
    * kernel's pixels). Output (media_id, payload, width, height).
    * One mapPartitions stage, nothing leaves the partition — the
    * thumbnail/downsample pass of every multimodal training pipeline,
    * now with a real codec on both ends where [[resize]] (d5e) keeps
    * the payload-opaque plan-shape form. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    require(w > 0 && h > 0, s"target dims must be positive: ${w}x$h")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          // positional getters — see synthImages' fusion note
          val img = ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          require(img != null, "undecodable image payload")
          val iw = img.getWidth; val ih = img.getHeight
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val sy = (y.toLong * ih / h).toInt
            var x = 0
            while (x < w) {
              out.setRGB(x, y, img.getRGB((x.toLong * iw / w).toInt, sy))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          Row(r.getLong(0), bos.toByteArray, w, h)
        }
      }(enc)
  }

  /** REAL lossy-codec round-trip with quantified fidelity: each PNG
    * payload is JPEG-encoded at `quality` through the real
    * `javax.imageio` writer, decoded back, and compared — cell-exact —
    * against the lossless original's luma grid and perceptual hashes.
    * Output per image: dims plus five VERDICT booleans
    * (decode dims survive, encode is bytewise deterministic, max
    * per-cell luma error ≤ `cellErrTol`, aHash/dHash hamming ≤
    * `hamTol`). Verdicts — not raw JPEG-derived values — are the
    * declared output because lossy codec bytes are codec-version
    * facts, not engine facts: DuckDB can't decode JPEG, so the oracle
    * asserts the verdicts (the d3e self-validation pattern). The plan
    * is one mapPartitions stage: encode, decode, grid, hash, compare —
    * nothing leaves the partition, the 100 TB shape of every
    * transcode pipeline. */
  def jpegRoundTrip(media: DataFrame, quality: Float,
      cellErrTol: Int, hamTol: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("dims_ok", BooleanType),
      StructField("deterministic", BooleanType),
      StructField("cell_err_ok", BooleanType),
      StructField("ahash_ok", BooleanType),
      StructField("dhash_ok", BooleanType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          // positional getters — see synthImages' fusion note
          val png = r.getAs[Array[Byte]](1)
          val (pw, ph, pCells) = ImageCodec.lumaGrid(png, grid = 8)
          val jpeg = ImageCodec.encodeJpeg(png, quality)
          val deterministic =
            java.util.Arrays.equals(jpeg, ImageCodec.encodeJpeg(png, quality))
          val (jw, jh, jCells) = ImageCodec.lumaGrid(jpeg, grid = 8)
          var maxErr = 0
          var i = 0
          while (i < 64) {
            maxErr = math.max(maxErr, math.abs(pCells(i) - jCells(i)))
            i += 1
          }
          val hamA = ImageCodec.hamming(
            ImageCodec.aHash64(pCells), ImageCodec.aHash64(jCells))
          val hamD = ImageCodec.hamming(
            ImageCodec.dHash56(pCells), ImageCodec.dHash56(jCells))
          Row(r.getLong(0), pw, ph, jw == pw && jh == ph, deterministic,
            maxErr <= cellErrTol, hamA <= hamTol, hamD <= hamTol)
        }
      }(enc)
  }

  /** REAL audio codec — RIFF/WAVE PCM through `javax.sound.sampled`
    * (JDK-standard; works headless — the file readers/writers never
    * touch an audio device). The lossless-container counterpart of the
    * PNG story: 16-bit signed PCM in a WAV container round-trips
    * bit-exactly, so every decoded-sample-derived quantity is
    * oracle-expressible in pure integer SQL.
    *
    *  - `synthSamples` renders a deterministic mono 16-bit signal
    *    (sample = small-integer formula of (id, n) — NOT a float sine,
    *    so the oracle needs no trig or rounding emulation);
    *  - `encodeWav` packs those samples through the real
    *    `AudioSystem.write` WAV writer;
    *  - `decodeWav` parses the container with the real
    *    `AudioSystem.getAudioInputStream` reader and returns the
    *    format's sample rate plus the exact samples.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Deterministic per-sample formula — small integers only,
      * replicated verbatim by the d5h DuckDB oracle:
      * floorMod(id·7919 + n·104729 + n²·31, 2¹⁶) − 2¹⁵. */
    def synthSamples(id: Long, n: Int): Array[Short] = {
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        val v = math.floorMod(
          id * 7919L + i.toLong * 104729L + i.toLong * i.toLong * 31L,
          65536L) - 32768L
        out(i) = v.toShort
        i += 1
      }
      out
    }

    /** Pack mono 16-bit signed little-endian PCM into a real WAV
      * container via `AudioSystem.write`. */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
        /*signed=*/ true, /*bigEndian=*/ false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      finally ais.close()
      bos.toByteArray
    }

    /** REAL container parse: `AudioSystem.getAudioInputStream` walks
      * the RIFF chunks and exposes the fmt fields; we require the
      * 16-bit signed mono PCM this pipeline writes and return
      * (sampleRate, exact samples), honoring the container's declared
      * endianness. */
    def decodeWav(payload: Array[Byte]): (Int, Array[Short]) = {
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected mono 16-bit signed PCM, got $fmt")
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Short](n)
        val le = !fmt.isBigEndian
        var i = 0
        while (i < n) {
          out(i) =
            if (le) (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
            else (((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)).toShort
          i += 1
        }
        (fmt.getSampleRate.toInt, out)
      } finally ais.close()
    }
  }

  /** Deterministic REAL-WAV media rows for an id column: each id
    * renders the [[AudioCodec.synthSamples]] signal and encodes through
    * the real `AudioSystem` WAV writer, partition-parallel — the audio
    * analog of [[synthImages]]. */
  def synthAudio(ids: DataFrame, idCol: String, sampleRate: Int,
      nSamples: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // positional getters — see synthImages' fusion note
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, AudioCodec.encodeWav(
            AudioCodec.synthSamples(id, nSamples), sampleRate))
        }
      }(enc)
  }

  /** REAL audio decode + exact integer signal features over binary WAV
    * payloads: (media_id, payload) → (media_id, sample_rate, n_samples,
    * duration_ms, peak_abs, zero_crossings, energy). All integer math
    * over the decoded samples — duration truncates like SQL integer
    * division, zero crossings count sign flips with sign(s) := s < 0,
    * energy is Σ s² in a long (2 k samples × 2³⁰ max per term is far
    * under 2⁶³). One mapPartitions stage, nothing leaves the partition —
    * the same embarrassingly-parallel shape as [[imageHashes]], bounded
    * by codec throughput, not the engine. */
  def audioFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("duration_ms", LongType),
      StructField("peak_abs", IntegerType),
      StructField("zero_crossings", LongType),
      StructField("energy", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          // positional getters — see synthImages' fusion note
          val (rate, s) = AudioCodec.decodeWav(r.getAs[Array[Byte]](1))
          var peak = 0
          var zc = 0L
          var energy = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            val a = math.abs(v)
            if (a > peak) peak = a
            if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
            energy += v.toLong * v
            i += 1
          }
          Row(r.getLong(0), rate, s.length,
            s.length.toLong * 1000L / rate, peak, zc, energy)
        }
      }(enc)
  }

  /** REAL video CONTAINER parser — ISO base media file format (the MP4
    * box structure, ISO/IEC 14496-12). No sample decode (no video codec
    * in the JDK — the codec layer stays a documented stub) but the
    * container walk is real and general: big-endian size+type headers,
    * 64-bit `largesize` boxes, recursion into container boxes, unknown
    * boxes skipped by size. At 100 TB this is the metadata-extraction
    * pass every video pipeline runs BEFORE deciding what to decode —
    * duration/timescale/track geometry from the first kilobytes,
    * no codec required.
    *
    * `synthMp4` writes a minimal valid file per the spec — `ftyp` +
    * `moov`(`mvhd` + `trak`(`tkhd`)) + `mdat` — with all varying fields
    * driven by small-integer formulas of the id, so the d5i oracle
    * recomputes every parsed value without touching bytes. */
  object VideoContainer {

    private def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    private def u64(b: Array[Byte], off: Int): Long =
      (u32(b, off) << 32) | u32(b, off + 4)

    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    private def box(boxType: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ boxType.getBytes("US-ASCII") ++ payload

    /** Deterministic per-id container fields — replicated verbatim by
      * the d5i DuckDB oracle. */
    def synthFields(id: Long): (Int, Int, Int, Int, Int) = (
      /*timescale*/ 600 + math.floorMod(id * 7, 400L).toInt,
      /*duration */ math.floorMod(id * 9973L, 100000L).toInt,
      /*width    */ 160 + math.floorMod(id * 3, 32L).toInt * 8,
      /*height   */ 96 + math.floorMod(id * 5, 24L).toInt * 8,
      /*mdatLen  */ math.floorMod(id, 17L).toInt)

    /** Write a minimal valid ISO-BMFF file: ftyp + moov(mvhd +
      * trak(tkhd)) + mdat, all sizes computed, all multi-byte ints
      * big-endian per the spec. */
    def synthMp4(id: Long): Array[Byte] = {
      val (timescale, duration, width, height, mdatLen) = synthFields(id)
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII") ++ be32(512L) ++
          "isom".getBytes("US-ASCII") ++ "mp42".getBytes("US-ASCII"))
      // mvhd version 0: ver/flags, creation, modification, timescale,
      // duration, rate 1.0 (16.16), volume 1.0 (8.8) + reserved,
      // identity matrix, 6×u32 pre_defined, next_track_ID
      val mvhd = box("mvhd",
        be32(0L) ++ be32(0L) ++ be32(0L) ++
          be32(timescale.toLong) ++ be32(duration.toLong) ++
          be32(0x00010000L) ++
          Array[Byte](0x01, 0x00, 0, 0) ++ be32(0L) ++ be32(0L) ++
          (be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++
            be32(0L) ++ be32(0x00010000L) ++ be32(0L) ++
            be32(0L) ++ be32(0L) ++ be32(0x40000000L)) ++
          Array.fill(24)(0.toByte) ++
          be32(2L))
      // tkhd version 0: ver/flags (track enabled = 1), creation,
      // modification, track_ID, reserved, duration, 2×u32 reserved,
      // layer/alternate_group/volume/reserved, matrix, width/height
      // as 16.16 fixed point
      val tkhd = box("tkhd",
        be32(1L) ++ be32(0L) ++ be32(0L) ++ be32(1L) ++ be32(0L) ++
          be32(duration.toLong) ++ be32(0L) ++ be32(0L) ++
          Array.fill(8)(0.toByte) ++
          (be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++
            be32(0L) ++ be32(0x00010000L) ++ be32(0L) ++
            be32(0L) ++ be32(0L) ++ be32(0x40000000L)) ++
          be32(width.toLong << 16) ++ be32(height.toLong << 16))
      val moov = box("moov", mvhd ++ box("trak", tkhd))
      val mdat = box("mdat", Array.tabulate(mdatLen)(i =>
        math.floorMod(id + i, 251L).toByte))
      ftyp ++ moov ++ mdat
    }

    /** Parsed container metadata. */
    final case class Meta(majorBrand: String, timescale: Int, duration: Long,
        trackId: Long, width: Int, height: Int, mdatBytes: Long, nBoxes: Int)

    private val containers = Set("moov", "trak", "mdia", "minf", "stbl",
      "edts", "dinf", "udta")

    /** General box-tree walk: returns every box's (type, payloadOffset,
      * payloadSize, depth), handling size==1 (64-bit largesize) and
      * size==0 (box extends to end of enclosing scope) per the spec. */
    def walkBoxes(b: Array[Byte]): Seq[(String, Long, Long, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Int)]
      def walk(start: Long, end: Long, depth: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val size32 = u32(b, off.toInt)
          val t = tag(b, off.toInt + 4)
          val (boxSize, hdr) =
            if (size32 == 1L) {
              // the 64-bit largesize lives at off+8..off+16 — a header
              // truncated inside that range is malformed input, not an
              // index error
              require(off + 16 <= end,
                s"malformed box '$t' at $off: truncated largesize header")
              (u64(b, off.toInt + 8), 16L)
            } else if (size32 == 0L) (end - off, 8L)
            else (size32, 8L)
          require(boxSize >= hdr && off + boxSize <= end,
            s"malformed box '$t' at $off: size $boxSize exceeds scope $end")
          out += ((t, off + hdr, boxSize - hdr, depth))
          if (containers(t)) walk(off + hdr, off + boxSize, depth + 1)
          off += boxSize
        }
      }
      walk(0L, b.length.toLong, 0)
      out.toSeq
    }

    /** Parse the boxes a metadata pass needs: ftyp major brand, mvhd
      * timescale/duration (version 0 and 1), first tkhd track id +
      * 16.16 width/height, total mdat payload bytes. */
    def parse(b: Array[Byte]): Meta = {
      val boxes = walkBoxes(b)
      var brand = ""
      var timescale = 0
      var duration = 0L
      var trackId = 0L
      var width = 0
      var height = 0
      var mdat = 0L
      boxes.foreach { case (t, off, size, _) =>
        val o = off.toInt
        t match {
          case "ftyp" => brand = tag(b, o)
          case "mvhd" =>
            val version = b(o) & 0xff
            if (version == 1) {
              timescale = u32(b, o + 20).toInt
              duration = u64(b, o + 24)
            } else {
              timescale = u32(b, o + 12).toInt
              duration = u32(b, o + 16)
            }
          case "tkhd" if trackId == 0L =>
            val version = b(o) & 0xff
            val idOff = if (version == 1) o + 20 else o + 12
            trackId = u32(b, idOff)
            // width/height are the LAST 8 payload bytes (after the matrix)
            width = (u32(b, (off + size - 8).toInt) >> 16).toInt
            height = (u32(b, (off + size - 4).toInt) >> 16).toInt
          case "mdat" => mdat += size
          case _ => ()
        }
      }
      Meta(brand, timescale, duration, trackId, width, height, mdat,
        boxes.length)
    }
  }

  /** Deterministic REAL-container video media rows: each id writes the
    * minimal valid ISO-BMFF file, partition-parallel — the video analog
    * of [[synthImages]]/[[synthAudio]] (container only; no codec). */
  def synthVideos(ids: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // positional getters — see synthImages' fusion note
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, VideoContainer.synthMp4(id))
        }
      }(enc)
  }

  /** REAL ISO-BMFF metadata extraction over binary payloads:
    * (media_id, payload) → (media_id, major_brand, timescale, duration,
    * duration_ms, track_id, width, height, mdat_bytes, n_boxes). One
    * mapPartitions stage — the no-decode metadata pass every video
    * pipeline runs first, reading structure instead of samples. */
  def videoMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("major_brand", StringType),
      StructField("timescale", IntegerType),
      StructField("duration", LongType),
      StructField("duration_ms", LongType),
      StructField("track_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mdat_bytes", LongType),
      StructField("n_boxes", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          // positional getters — see synthImages' fusion note
          val m = VideoContainer.parse(r.getAs[Array[Byte]](1))
          val durMs =
            if (m.timescale == 0) 0L else m.duration * 1000L / m.timescale
          Row(r.getLong(0), m.majorBrand, m.timescale, m.duration,
            durMs, m.trackId, m.width, m.height, m.mdatBytes, m.nBoxes)
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
