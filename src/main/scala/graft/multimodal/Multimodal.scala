package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal column handling (SURVEY.md §2 B53): image/audio/video payloads
  * ride through the engine as opaque `binary` columns with typed metadata;
  * decode/feature-extraction runs as a typed `mapPartitions` over the bytes
  * — the Spark plumbing (schema, batching, partition-parallel execution) is
  * real, while the codec itself is STUBBED behind [[Decoder]]: real image or
  * audio libraries are not available in this environment, so the default
  * decoder computes deterministic byte-level features. Swapping in a real
  * codec is a one-line constructor change, not a pipeline change.
  *
  * Scale posture: mapPartitions keeps the decode inside the scan stage (no
  * shuffle, no driver collect); one output row per input row, constant-size
  * features, so the stage is embarrassingly parallel at any data size.
  */
object Multimodal {

  /** Per-payload features; the `Decoder` contract. */
  case class Features(
      doc_id: Long, n_bytes: Int, mean_byte: Double, max_byte: Int, checksum: Long)

  /** Pluggable codec: bytes → (n_bytes, mean_byte, max_byte, checksum). */
  trait Decoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): Features
  }

  /** The deterministic stub codec (see class doc): byte statistics + a
    * 31-ary rolling checksum mod 1e9+7 seeded at 1. */
  object StubDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): Features = {
      var sum = 0L
      var mx = 0
      var ck = 1L
      var i = 0
      while (i < bytes.length) {
        val u = bytes(i) & 0xff
        sum += u
        if (u > mx) mx = u
        ck = (ck * 31 + u) % 1000000007L
        i += 1
      }
      val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
      Features(id, bytes.length, mean, mx, ck)
    }
  }

  /** REAL image decode — `javax.imageio` ships in the standard JDK, so the
    * PNG path needs no external library: bytes → BufferedImage → width,
    * height and exact per-channel sums. Headless-safe (ImageIO rasters
    * never touch a display). This is the production codec shape the
    * [[StubDecoder]] stands in for on formats whose libraries are absent;
    * PNG is lossless, so a synthesized fixture's pixel formula survives the
    * encode/decode round-trip exactly and the DuckDB oracle can recompute
    * the sums in closed form. */
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           sum_r: Long, sum_g: Long, sum_b: Long)

  def decodeImage(id: Long, bytes: Array[Byte]): ImageFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $id: not a decodable image")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    ImageFeatures(id, img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** Average-hash (aHash) perceptual fingerprint from a REAL decode
    * (SURVEY.md §2 B115) — the classic near-duplicate image signature:
    * integer milli-luma (299R + 587G + 114B, the BT.601 weights scaled
    * ×1000 so nothing floats), a 4×3 grid of equal cells, bit (cy·4+cx)
    * set iff cellSum · 12 > totalSum (strict compare in exact integers —
    * a constant image hashes to 0). Small pixel perturbations move a cell
    * sum by ~10⁻⁴ of the threshold scale, so re-encodes/minor edits keep
    * their hash while different images diverge — which is what makes
    * equal-hash blocking a dedup JOIN key. Requires width % 4 == 0 and
    * height % 3 == 0 (the fixture shape); production would letterbox or
    * average fractional cells. */
  case class ImageHash(doc_id: Long, width: Int, height: Int, ahash: Long)

  def decodeAHash(id: Long, bytes: Array[Byte]): ImageHash = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $id: not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    require(w % 4 == 0 && h % 3 == 0,
      s"doc $id: aHash grid needs width%4==0 and height%3==0, got ${w}x$h")
    val (cw, ch) = (w / 4, h / 3)
    val cells = new Array[Long](12)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        cells((y / ch) * 4 + (x / cw)) += luma
        total += luma
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var c = 0
    while (c < 12) {
      if (cells(c) * 12 > total) hash |= 1L << c
      c += 1
    }
    ImageHash(id, w, h, hash)
  }

  /** aHash rows for `(doc_id, content)` via [[decodeAHash]] in a typed
    * mapPartitions — decode in the scan stage, no shuffle. */
  def imageAHash(spark: SparkSession, bin: DataFrame): DataFrame = {
    import spark.implicits._
    bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAHash(id, bytes) })
      .toDF()
  }

  /** Image features for `(doc_id, content)` rows via [[decodeImage]] inside
    * a typed mapPartitions — decode stays in the scan stage, no shuffle. */
  def imageFeatures(spark: SparkSession, bin: DataFrame): DataFrame = {
    import spark.implicits._
    bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeImage(id, bytes) })
      .toDF()
  }

  /** REAL audio decode: a WAV/RIFF 16-bit-PCM parser over the raw bytes
    * (pure `java.nio` — WAV is a public byte format, no library needed):
    * header → sample rate, data chunk → exact |sample| sum. */
  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
                           sum_abs: Long)

  /** Parsed 16-bit mono PCM payload: sample accessor over the data chunk. */
  private final case class WavPcm(sampleRate: Int, n: Int,
                                  sample: Int => Short)

  private def parseWav(id: Long, bytes: Array[Byte]): WavPcm = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"doc $id: not a RIFF/WAVE payload")
    // Walk the chunk list — a conforming writer may place LIST/fact/etc.
    // chunks before 'data', so 'fmt ' and 'data' are located by tag, never
    // by fixed offset. Chunk payloads are padded to even length.
    var off = 12
    var fmtOff = -1
    var fmtLen = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val t = tag(off)
      val len = bb.getInt(off + 4)
      // compare in Long: a crafted len near Int.MaxValue would wrap the
      // Int sum negative, pass the check, and read out of bounds
      require(len >= 0 && off + 8 + len.toLong <= bytes.length,
        s"doc $id: chunk '$t' declares $len bytes past end of payload")
      if (t == "fmt ") { fmtOff = off + 8; fmtLen = len }
      else if (t == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    require(fmtOff >= 0 && dataOff >= 0,
      s"doc $id: WAV missing ${if (fmtOff < 0) "'fmt '" else "'data'"} chunk")
    require(fmtLen >= 16,
      s"doc $id: 'fmt ' chunk too short ($fmtLen bytes) to hold PCM fields")
    val audioFormat = bb.getShort(fmtOff).toInt
    val channels = bb.getShort(fmtOff + 2).toInt
    val sampleRate = bb.getInt(fmtOff + 4)
    val bitsPerSample = bb.getShort(fmtOff + 14).toInt
    require(audioFormat == 1 && bitsPerSample == 16 && channels == 1,
      s"doc $id: unsupported WAV (format=$audioFormat bits=$bitsPerSample " +
        s"channels=$channels); only 16-bit mono PCM is decodable here")
    WavPcm(sampleRate, dataLen / 2, k => bb.getShort(dataOff + 2 * k))
  }

  def decodeWav(id: Long, bytes: Array[Byte]): AudioFeatures = {
    val w = parseWav(id, bytes)
    var sum = 0L
    var k = 0
    while (k < w.n) { sum += math.abs(w.sample(k).toLong); k += 1 }
    AudioFeatures(id, w.sampleRate, w.n, sum)
  }

  /** AUDIO energy-band fingerprint (SURVEY.md §2 B123) — the aHash idea
    * ([[decodeAHash]]) transplanted to PCM: cut the clip into `bands`
    * equal time bands (sample k → band k·bands DIV n, the replayable
    * integer partition), sum |sample| per band, and set bit b iff
    * band b's energy is STRICTLY above the uniform share
    * (bandAbs·bands > totalAbs). All int64 (|s| ≤ 32768, so a band sum
    * fits to ~2.8·10¹⁴ samples); robust to sample-level perturbation
    * (one sample moves a band sum by ≤ 65535 of a ~n/bands·16k scale)
    * while clips of different content or length diverge — the property
    * a fingerprint needs for equal-hash blocking dedup. A production
    * fingerprint (Chromaprint-style) adds a filterbank over overlapping
    * FFT windows; the energy-band form keeps the exact-integer oracle. */
  case class AudioHash(doc_id: Long, n_samples: Long, fp: Long)

  def decodeAudioBandHash(id: Long, bytes: Array[Byte],
                          bands: Int = 12): AudioHash = {
    require(bands >= 1 && bands <= 63, s"doc $id: bands ($bands) out of range")
    val w = parseWav(id, bytes)
    require(w.n >= bands, s"doc $id: ${w.n} samples < $bands bands")
    val acc = new Array[Long](bands)
    var total = 0L
    var k = 0
    while (k < w.n) {
      val a = math.abs(w.sample(k).toLong)
      acc((k.toLong * bands / w.n).toInt) += a
      total += a
      k += 1
    }
    var fp = 0L
    var b = 0
    while (b < bands) {
      if (acc(b) * bands > total) fp |= 1L << b
      b += 1
    }
    AudioHash(id, w.n, fp)
  }

  /** Fingerprint rows for `(doc_id, content)` via [[decodeAudioBandHash]]
    * in a typed mapPartitions — decode in the scan stage, no shuffle. */
  def audioBandHash(spark: SparkSession, bin: DataFrame,
                    bands: Int = 12): DataFrame = {
    import spark.implicits._
    bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeAudioBandHash(id, bytes, bands) })
      .toDF()
  }

  /** Audio features for `(doc_id, content)` rows via [[decodeWav]]. */
  def audioFeatures(spark: SparkSession, bin: DataFrame): DataFrame = {
    import spark.implicits._
    bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeWav(id, bytes) })
      .toDF()
  }

  /** Decode features for `(doc_id: long, content: binary)` rows. */
  def features(spark: SparkSession, bin: DataFrame,
               decoder: Decoder = StubDecoder): DataFrame = {
    import spark.implicits._
    bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decoder.decode(id, bytes) })
      .toDF()
  }

  /** Frame sampling (the video-payload access pattern): the payload is cut
    * into fixed `frameLen`-byte frames and every `stride`-th frame is kept —
    * a 1→N generator via typed flatMap, output bounded by payload/stride.
    * A real video codec replaces the byte-slice "frame decode" (per-frame
    * sum here stands in for a decoded frame's features); the fan-out shape,
    * schema, and partition-parallel execution are the production plumbing.
    */
  def frameSample(spark: SparkSession, bin: DataFrame,
                  frameLen: Int = 64, stride: Int = 4): DataFrame = {
    require(frameLen > 0 && stride > 0)
    import spark.implicits._
    bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = (bytes.length + frameLen - 1) / frameLen
        (0 until nFrames).iterator.filter(_ % stride == 0).map { fi =>
          val start = fi * frameLen
          val end = math.min(start + frameLen, bytes.length)
          var sum = 0L
          var i = start
          while (i < end) { sum += bytes(i) & 0xff; i += 1 }
          (id, fi, end - start, sum)
        }
      }.toDF("doc_id", "frame_idx", "n_bytes", "byte_sum")
  }

  /** KEYFRAME selection (SURVEY.md §2 B127) — the scene-change pass every
    * video-ingest pipeline runs before paying per-frame decode/embedding
    * cost: sample EVERY frame ([[frameSample]] stride 1, per-frame byte
    * sums standing in for decoded-frame features exactly as that operator
    * documents), then keep a frame iff it is the payload's first or its
    * feature moved by more than 1/`changeDen` RELATIVE to the previous
    * frame — `|sum − prev| · changeDen > prev`, integer-exact, no float
    * ratio. A real pipeline swaps the byte sum for a decoded-frame
    * perceptual feature (the [[decodeAHash]] family); the selection
    * operator — bounded fan-out, per-payload window, integer change
    * test — is unchanged.
    *
    * Scale posture: the window partitions BY PAYLOAD (state bounded by
    * one payload's frame count, never the corpus) on the same key the
    * frame generator emits — one shuffle of frame-sum rows, then a
    * linear pass. */
  def keyframes(spark: SparkSession, bin: DataFrame, frameLen: Int = 64,
                changeDen: Int = 20): DataFrame = {
    require(changeDen >= 1, s"changeDen ($changeDen) must be >= 1")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{abs, col, lag}
    val frames = frameSample(spark, bin, frameLen, stride = 1)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames.withColumn("prev", lag(col("byte_sum"), 1).over(w))
      .filter(col("prev").isNull ||
        abs(col("byte_sum") - col("prev")) * changeDen > col("prev"))
      .select(col("doc_id"), col("frame_idx"), col("n_bytes"),
        col("byte_sum"))
  }

  /** REAL MJPEG keyframe selection (r14 verdict #7) — [[keyframes]] with
    * the byte-slice "frame decode" replaced by an actual video-container
    * walk and codec: MJPEG is concatenated JPEG frames (the simplest real
    * container — what many IP cameras emit), so the splitter scans for SOI
    * markers (FF D8 FF) and each frame runs through the SAME javax.imageio
    * JPEG decoder q_image_decode_jpeg proved exact on block-uniform
    * fixtures. Per-frame feature = the decoded channel sum (r = g = b on
    * the gray fixtures); the selection rule is [[keyframes]]' verbatim —
    * keep frame 0 and frames whose feature moved by more than 1/changeDen
    * RELATIVE to the previous frame, integer-exact.
    *
    * The splitter is a real marker-segment walk, not a raw FF D8 FF byte
    * scan (r15 advice): length-carrying segments (APPn/COM/DQT/DHT/SOF…)
    * are skipped by their length field, so an EXIF APP1 payload with an
    * embedded thumbnail — whose bytes CONTAIN a SOI a raw scan would
    * split on, mid-frame, decodable, silently mis-featured — can never
    * produce a boundary; inside the post-SOS entropy stream FF is only a
    * stuffed 00, a restart D0–D7, a fill FF, or the next real marker, so
    * each frame ends exactly at its own EOI. Malformed input (no SOI at
    * a frame start, truncated segment, marker desync) fails LOUDLY, as
    * does a corrupted frame slice (ImageIO returns null → require) —
    * never a silent mis-feature. Scale posture: decode stays in the scan
    * stage (flatMap, no shuffle); the selection window partitions BY
    * PAYLOAD — state bounded by one video's frame count. */
  def mjpegKeyframes(spark: SparkSession, bin: DataFrame,
                     changeDen: Int = 20): DataFrame = {
    require(changeDen >= 1, s"changeDen ($changeDen) must be >= 1")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{abs, col, lag}
    val frames = bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // empty payload would skip the walk entirely and leave a single
        // undersized sliding group → raw MatchError; fail loudly like
        // every other non-MJPEG input (jpegFrameEnd covers non-empty)
        require(bytes.nonEmpty, s"doc $id: empty payload — not MJPEG")
        val bounds = scala.collection.mutable.ArrayBuffer[Int](0)
        var off = 0
        while (off < bytes.length) {
          off = jpegFrameEnd(id, bytes, off)
          bounds += off
        }
        bounds.toSeq.sliding(2).zipWithIndex.map { case (Seq(a, b), fi) =>
          val f = decodeImage(id, java.util.Arrays.copyOfRange(bytes, a, b))
          (id, fi, f.width, f.height, f.sum_r)
        }
      }.toDF("doc_id", "frame_idx", "width", "height", "sum_gray")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames.withColumn("prev", lag(col("sum_gray"), 1).over(w))
      .filter(col("prev").isNull ||
        abs(col("sum_gray") - col("prev")) * changeDen > col("prev"))
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("sum_gray"))
  }

  /** Walk ONE JPEG frame starting at `off`; returns the index just past
    * its EOI ([[mjpegKeyframes]]' splitter kernel). Marker-segment walk
    * per ITU T.81 §B: after SOI, every segment either carries a 2-byte
    * big-endian length (skipped wholesale — this is what makes an EXIF
    * thumbnail's embedded SOI invisible) or is standalone (TEM, RSTn);
    * after an SOS header the entropy stream is scanned with the three FF
    * escapes (stuffed 00, restart D0–D7, fill FF) until the next REAL
    * marker, which hands control back to the segment walk — so multi-scan
    * (progressive) frames terminate at their own EOI too. Every structural
    * violation is a loud require, never a guessed boundary. */
  private[multimodal] def jpegFrameEnd(id: Long, bytes: Array[Byte],
                                       off: Int): Int = {
    def u(i: Int): Int = bytes(i) & 0xff
    require(off + 1 < bytes.length && u(off) == 0xff && u(off + 1) == 0xd8,
      s"doc $id: no JPEG SOI at offset $off — not MJPEG")
    var i = off + 2
    var end = -1
    while (end < 0) {
      require(i + 1 < bytes.length, s"doc $id: truncated JPEG at $i")
      require(u(i) == 0xff,
        f"doc $id: marker desync at $i (0x${u(i)}%02x, expected 0xff)")
      u(i + 1) match {
        case 0xd9 => end = i + 2 // EOI — this frame's end
        case 0xd8 => require(false,
          s"doc $id: nested SOI at $i outside any segment payload"); ()
        case 0xff => i += 1 // fill byte before a marker
        case 0x01 => i += 2 // TEM, standalone
        case m if m >= 0xd0 && m <= 0xd7 => i += 2 // RSTn, standalone
        case 0xda => // SOS: skip header, then entropy-scan to a real marker
          require(i + 3 < bytes.length, s"doc $id: truncated SOS at $i")
          i += 2 + ((u(i + 2) << 8) | u(i + 3))
          var entropy = true
          while (entropy) {
            require(i + 1 < bytes.length,
              s"doc $id: entropy stream ran past the payload end")
            if (u(i) != 0xff) i += 1
            else u(i + 1) match {
              case 0x00 => i += 2 // stuffed data FF
              case 0xff => i += 1 // fill
              case m if m >= 0xd0 && m <= 0xd7 => i += 2 // restart
              case _ => entropy = false // real marker — outer walk takes it
            }
          }
        case m =>
          require(m >= 0xc0, f"doc $id: reserved marker 0x$m%02x at $i")
          require(i + 3 < bytes.length,
            s"doc $id: truncated segment header at $i")
          i += 2 + ((u(i + 2) << 8) | u(i + 3))
      }
    }
    end
  }

  /** Resize (the image-payload access pattern): downsample the payload to
    * `nPx` equal-width buckets by exact integer bucket assignment
    * (`bucket = i·nPx div n`) and per-bucket byte sums — the strided-average
    * shape of an image resize with deterministic integer arithmetic (the
    * caller divides byte_sum/n_in for the "pixel" value). Constant-size
    * output per row, no shuffle. */
  def resize(spark: SparkSession, bin: DataFrame, nPx: Int = 16): DataFrame = {
    require(nPx > 0)
    import spark.implicits._
    bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = bytes.length
        val sums = new Array[Long](nPx)
        val cnts = new Array[Long](nPx)
        var i = 0
        while (i < n) {
          val b = (i.toLong * nPx / n).toInt
          sums(b) += bytes(i) & 0xff
          cnts(b) += 1
          i += 1
        }
        (0 until nPx).iterator.filter(cnts(_) > 0)
          .map(j => (id, j, sums(j), cnts(j)))
      }.toDF("doc_id", "px", "byte_sum", "n_in")
  }
}
