package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Real-codec multimodal queries (SURVEY.md §2 B53): PNG decode via the
  * JDK's javax.imageio and WAV/PCM parse via java.nio — no external
  * libraries, no stub. The fixtures are synthesized from closed-form pixel/
  * sample formulas; PNG is lossless and PCM is raw, so the DuckDB oracle
  * recomputes the exact channel/sample sums from the same formulas —
  * hash-proof that a REAL decoder ran, not byte statistics.
  *
  * Fixture writers are driver-side loops, hard-capped (50 images / 30
  * clips) — test fixtures, not a production pattern; a real corpus arrives
  * as files and is only ever read distributed (binaryFile scan →
  * mapPartitions decode, no shuffle, no collect).
  */
object Media {
  type Q = (SparkSession, String) => DataFrame

  private val NImages = 50
  private val ImgW = 16
  private val ImgH = 12
  private val NClips = 30
  private val SampleRate = 8000
  private val NAfpBase = 40
  private val NAfpVar = 10

  private def pxR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  private def pxG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 11 + y * 3) % 256).toInt
  private def pxB(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 5 + y * 19) % 256).toInt

  /** 16×12 RGB PNGs, pixel channels from the closed-form formulas above. */
  private def imageDir(d: String): String = {
    val dir = new File("target/qscratch/media_png_" +
      d.replaceAll("[^a-zA-Z0-9.]", "_"))
    graft.BuildOnce(dir) {
      (0 until NImages).foreach { id =>
        val img = new java.awt.image.BufferedImage(ImgW, ImgH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until ImgH; x <- 0 until ImgW)
          img.setRGB(x, y, (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))
        javax.imageio.ImageIO.write(img, "png", new File(dir, f"img$id%03d.png"))
      }
    }
    dir.getAbsolutePath
  }

  private val NJpeg = 40

  /** One gray value per 8×8 JPEG block: block (bx, by) of image `id` is
    * (id·37 + bx·59 + by·83) mod 256. */
  private def jpegGray(id: Long, bx: Int, by: Int): Int =
    ((id * 37 + bx * 59 + by * 83) % 256).toInt

  /** 16×12 grayscale-content JPEGs (RGB colorspace, R=G=B), one uniform
    * gray per 8×8 block, written at compression quality 1.0.
    *
    * Why THIS fixture shape makes a lossy codec oracle-checkable (probed
    * empirically — 50 images round-tripped with 0 pixel mismatches before
    * this landed): JPEG transforms each 8×8 block independently, and a
    * uniform block has only a DC coefficient, which the quality-1.0
    * quantization tables carry exactly; gray pixels (R=G=B) map to
    * Cb=Cr=128 exactly, so chroma conversion and subsampling add no
    * rounding either. The closed-form pixel formula therefore survives
    * encode→decode bit-for-bit and the DuckDB oracle recomputes the exact
    * channel sums — the PNG convention extended to a lossy format by
    * constructing the fixture inside the codec's exactness envelope. An
    * arbitrary-content JPEG would NOT hash-match a closed form; the entry
    * proves the decoder runs, not that JPEG is lossless. */
  private def jpegDir(d: String): String = {
    val dir = new File("target/qscratch/media_jpg_" +
      d.replaceAll("[^a-zA-Z0-9.]", "_"))
    graft.BuildOnce(dir) {
      (0 until NJpeg).foreach { id =>
        val img = new java.awt.image.BufferedImage(ImgW, ImgH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until ImgH; x <- 0 until ImgW) {
          val g = jpegGray(id, x / 8, y / 8)
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
        }
        val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        val p = w.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(1.0f)
        val ios = javax.imageio.ImageIO.createImageOutputStream(
          new File(dir, f"img$id%03d.jpg"))
        try {
          w.setOutput(ios)
          w.write(null, new javax.imageio.IIOImage(img, null, null), p)
        } finally { ios.close(); w.dispose() }
      }
    }
    dir.getAbsolutePath
  }

  private val NVideos = 12
  private val NFrames = 8

  /** One gray per 8×8 block of frame f of video v: frames come in groups
    * of 3 sharing IDENTICAL pixels (f DIV 3 drives the formula), so
    * within-group frames are byte-identical JPEGs — guaranteed non-scene-
    * changes the keyframe rule must drop — and group boundaries jump. */
  private def mjpegGray(v: Long, f: Int, bx: Int, by: Int): Int =
    ((v * 37 + (f / 3) * 41 + bx * 59 + by * 83) % 256).toInt

  /** B127 fixture: NVideos MJPEG files of NFrames concatenated 16×12
    * block-uniform quality-1.0 JPEGs — the jpegDir exactness envelope
    * (see that scaladoc for why the closed form survives the lossy codec
    * bit-for-bit), stacked into the simplest real video container. */
  private def mjpegDir(d: String): String = {
    val dir = new File("target/qscratch/media_mjpg_" +
      d.replaceAll("[^a-zA-Z0-9.]", "_"))
    graft.BuildOnce(dir) {
      (0 until NVideos).foreach { v =>
        val out = new java.io.ByteArrayOutputStream()
        (0 until NFrames).foreach { f =>
          val img = new java.awt.image.BufferedImage(ImgW, ImgH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until ImgH; x <- 0 until ImgW) {
            val g = mjpegGray(v, f, x / 8, y / 8)
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
          }
          val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
          val p = w.getDefaultWriteParam
          p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          p.setCompressionQuality(1.0f)
          val ios = javax.imageio.ImageIO.createImageOutputStream(out)
          try {
            w.setOutput(ios)
            w.write(null, new javax.imageio.IIOImage(img, null, null), p)
          } finally { ios.close(); w.dispose() }
        }
        java.nio.file.Files.write(
          new File(dir, f"vid$v%03d.mjpg").toPath, out.toByteArray)
      }
    }
    dir.getAbsolutePath
  }

  private val NPhashBase = 40
  private val NPhashVar = 10

  /** B115 fixture: the 40 base PNGs from the q_image_decode formulas plus
    * 10 NEAR-DUPLICATE variants — file id 1000+b is base b with exactly
    * one pixel perturbed ((0,0)'s R channel bumped by 1 mod 256, a
    * replayable closed form). One pixel moves a cell's milli-luma sum by
    * ~3·10² of a ~5·10⁷ threshold scale, so the variant aHash-collides
    * with its base while different bases diverge — the planted ground
    * truth for perceptual dedup. */
  private def phashDir(d: String): String = {
    val dir = new File("target/qscratch/media_phash_" +
      d.replaceAll("[^a-zA-Z0-9.]", "_"))
    graft.BuildOnce(dir) {
      def write(fileId: Long, base: Long, bump: Boolean): Unit = {
        val img = new java.awt.image.BufferedImage(ImgW, ImgH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until ImgH; x <- 0 until ImgW) {
          val r0 = pxR(base, x, y)
          val r = if (bump && x == 0 && y == 0) (r0 + 1) % 256 else r0
          img.setRGB(x, y, (r << 16) | (pxG(base, x, y) << 8) | pxB(base, x, y))
        }
        javax.imageio.ImageIO.write(img, "png", new File(dir, f"img$fileId%04d.png"))
      }
      (0 until NPhashBase).foreach(id => write(id, id, bump = false))
      (0 until NPhashVar).foreach(b => write(1000L + b, b, bump = true))
    }
    dir.getAbsolutePath
  }

  /** Mono 16-bit PCM WAV clips; clip `id` has 400+13·id samples, sample k =
    * ((id·7919 + k·31) mod 65536) − 32768. */
  private def audioDir(d: String): String = {
    val dir = new File("target/qscratch/media_wav_" +
      d.replaceAll("[^a-zA-Z0-9.]", "_"))
    graft.BuildOnce(dir) {
      (0 until NClips).foreach { id =>
        val n = 400 + 13 * id
        val dataLen = 2 * n
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
          .putInt(16).putShort(1).putShort(1).putInt(SampleRate)
          .putInt(SampleRate * 2).putShort(2).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        (0 until n).foreach { k =>
          bb.putShort((((id.toLong * 7919 + k * 31) % 65536) - 32768).toShort)
        }
        java.nio.file.Files.write(
          new File(dir, f"clip$id%03d.wav").toPath, bb.array())
      }
    }
    dir.getAbsolutePath
  }

  /** B123 fixture: 40 base WAV clips (the q_audio_decode sample formula)
    * plus 10 NEAR-DUPLICATE variants — clip 1000+b is base b with sample 0
    * bumped by the closed form ((v+1) mod 65536) − 32768 (the pixel-bump
    * convention). One sample moves a band's |s|-energy by exactly 1 of a
    * ~(n/12)·16k scale, so the variant fingerprint-collides with its base
    * while different bases/lengths diverge — planted ground truth for
    * audio dedup. */
  private def audioFpDir(d: String): String = {
    val dir = new File("target/qscratch/media_afp_" +
      d.replaceAll("[^a-zA-Z0-9.]", "_"))
    graft.BuildOnce(dir) {
      def write(fileId: Long, base: Long, bump: Boolean): Unit = {
        val n = 400 + 13 * base.toInt
        val dataLen = 2 * n
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
          .putInt(16).putShort(1).putShort(1).putInt(SampleRate)
          .putInt(SampleRate * 2).putShort(2).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        (0 until n).foreach { k =>
          val v = (base * 7919 + k * 31) % 65536
          val v2 = if (bump && k == 0) (v + 1) % 65536 else v
          bb.putShort((v2 - 32768).toShort)
        }
        java.nio.file.Files.write(
          new File(dir, f"clip$fileId%04d.wav").toPath, bb.array())
      }
      (0 until NAfpBase).foreach(id => write(id, id, bump = false))
      (0 until NAfpVar).foreach(b => write(1000L + b, b, bump = true))
    }
    dir.getAbsolutePath
  }

  private def binScan(s: SparkSession, dir: String, glob: String, stem: String): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(regexp_extract(col("path"), stem + "([0-9]+)\\.", 1)
        .cast("long").as("doc_id"), col("content"))

  val defs: Map[String, Q] = Map(
    // B53 REAL image decode: binaryFile scan → javax.imageio PNG decode in
    // mapPartitions → exact per-channel sums. The oracle recomputes the
    // sums from the pixel formulas — only a real decoder can match it.
    "q_image_decode" -> { (s, d) =>
      Multimodal.imageFeatures(s, binScan(s, imageDir(d), "*.png", "img"))
        .orderBy(col("doc_id"))
    },

    // B53 REAL JPEG decode (r10 verdict #6): same binaryFile-scan →
    // javax.imageio mapPartitions dataflow as q_image_decode — ImageIO
    // auto-detects the format, so the operator body is shared and only the
    // fixture differs. See jpegDir for why a LOSSY codec still admits an
    // exact closed-form oracle here.
    "q_image_decode_jpeg" -> { (s, d) =>
      Multimodal.imageFeatures(s, binScan(s, jpegDir(d), "*.jpg", "img"))
        .orderBy(col("doc_id"))
    },

    // B127 REAL video keyframes (r14 verdict #7 — splitter contract and
    // selection rule on [[Multimodal.mjpegKeyframes]]; q_video_keyframes
    // on the stub payload stays as the format-agnostic baseline): MJPEG
    // container walk → real JPEG decode per frame → the integer
    // scene-change rule. Fixture frames repeat in groups of 3 (planted
    // guaranteed drops); the oracle recomputes every frame's channel sum
    // from the block-uniform closed form and replays the lag rule — only
    // a real splitter + decoder matches.
    "q_video_keyframes_mjpeg" -> { (s, d) =>
      Multimodal.mjpegKeyframes(s, binScan(s, mjpegDir(d), "*.mjpg", "vid"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // B53 REAL audio decode: WAV/RIFF 16-bit PCM header+samples parsed from
    // raw bytes; exact |sample| sums against the closed-form oracle.
    "q_audio_decode" -> { (s, d) =>
      Multimodal.audioFeatures(s, binScan(s, audioDir(d), "*.wav", "clip"))
        .orderBy(col("doc_id"))
    },

    // B115 PERCEPTUAL-HASH image dedup — [[Multimodal.decodeAHash]]
    // (integer milli-luma aHash; contract on the decoder) over REAL PNG
    // decodes, then an equal-hash self-join: the multimodal member of the
    // dedup family (exact sha / shingle / minhash / embedding / ...
    // / now pixels), with planted one-pixel-perturbed near-duplicates as
    // ground truth (see phashDir). The oracle recomputes every hash from
    // the closed-form pixel formulas — only a real decoder feeding the
    // exact integer aHash matches. Dedup shape at scale: hash in the scan
    // stage (mapPartitions), ONE equality join on the 64-bit key — the
    // bucket-blocking plan every signature dedup here uses.
    "q_image_phash_dedup" -> { (s, d) =>
      val h = Multimodal.imageAHash(s, binScan(s, phashDir(d), "*.png", "img"))
      h.select(col("doc_id").as("doc_a"), col("ahash"))
        .join(h.select(col("doc_id").as("doc_b"), col("ahash")), Seq("ahash"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("ahash"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // B123 AUDIO-FINGERPRINT dedup — [[Multimodal.decodeAudioBandHash]]
    // (integer energy-band fingerprint; contract on the decoder) over
    // REAL WAV/PCM decodes, then the same equal-hash blocking join as
    // B115 — the audio member of the dedup family, with planted
    // one-sample-perturbed variants as ground truth (see audioFpDir).
    // The join key includes n_samples: equal length is the cheap first
    // block (a fingerprint family match at different lengths is a
    // different clip), mirroring the oracle exactly. AudioFpSpec plants
    // the collisions and pins decode ≡ closed form.
    "q_audio_fingerprint_dedup" -> { (s, d) =>
      val h = Multimodal.audioBandHash(
        s, binScan(s, audioFpDir(d), "*.wav", "clip"), bands = 12)
      h.select(col("doc_id").as("doc_a"), col("n_samples"), col("fp"))
        .join(h.select(col("doc_id").as("doc_b"), col("n_samples"),
          col("fp")), Seq("n_samples", "fp"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("n_samples"), col("fp"))
        .orderBy(col("doc_a"), col("doc_b"))
    })

  val oracle: Map[String, String] = Map(
    "q_image_decode" ->
      s"""SELECT d.range AS doc_id, CAST($ImgW AS INT) AS width,
         |  CAST($ImgH AS INT) AS height,
         |  CAST(sum((d.range*31 + x.range*7 + y.range*13) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum((d.range*17 + x.range*11 + y.range*3) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((d.range*23 + x.range*5 + y.range*19) % 256) AS BIGINT) AS sum_b
         |FROM range($NImages) d CROSS JOIN range($ImgW) x CROSS JOIN range($ImgH) y
         |GROUP BY d.range ORDER BY doc_id""".stripMargin,

    // the MJPEG replay: closed-form per-frame gray sums (f DIV 3 drives
    // the formula — repeated frames in groups of 3), then the lag rule
    "q_video_keyframes_mjpeg" ->
      s"""WITH fr AS (SELECT v.range AS doc_id, f.range AS fi,
         |    CAST(sum((v.range*37 + (f.range//3)*41 + (x.range//8)*59
         |      + (y.range//8)*83) % 256) AS BIGINT) AS sum_gray
         |  FROM range($NVideos) v CROSS JOIN range($NFrames) f
         |  CROSS JOIN range($ImgW) x CROSS JOIN range($ImgH) y
         |  GROUP BY 1, 2),
         |k AS (SELECT doc_id, fi, sum_gray,
         |    lag(sum_gray) OVER (PARTITION BY doc_id ORDER BY fi) AS prev
         |  FROM fr)
         |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
         |  CAST($ImgW AS INT) AS width, CAST($ImgH AS INT) AS height,
         |  sum_gray
         |FROM k WHERE prev IS NULL OR abs(sum_gray - prev) * 20 > prev
         |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_image_decode_jpeg" ->
      s"""SELECT d.range AS doc_id, CAST($ImgW AS INT) AS width,
         |  CAST($ImgH AS INT) AS height,
         |  CAST(sum((d.range*37 + (x.range//8)*59 + (y.range//8)*83) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum((d.range*37 + (x.range//8)*59 + (y.range//8)*83) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((d.range*37 + (x.range//8)*59 + (y.range//8)*83) % 256) AS BIGINT) AS sum_b
         |FROM range($NJpeg) d CROSS JOIN range($ImgW) x CROSS JOIN range($ImgH) y
         |GROUP BY d.range ORDER BY doc_id""".stripMargin,

    // the aHash replay: base + bumped-pixel variants, milli-luma, 4x3
    // cells, the strict cellSum*12 > total threshold, equal-hash pairs
    "q_image_phash_dedup" ->
      s"""WITH ids AS (
         |  SELECT range AS fid, range AS base, FALSE AS bump FROM range($NPhashBase)
         |  UNION ALL
         |  SELECT 1000 + range, range, TRUE FROM range($NPhashVar)),
         |px AS (SELECT ids.fid, x.range AS x, y.range AS y,
         |    CASE WHEN ids.bump AND x.range = 0 AND y.range = 0
         |         THEN ((ids.base*31 + x.range*7 + y.range*13) % 256 + 1) % 256
         |         ELSE (ids.base*31 + x.range*7 + y.range*13) % 256 END AS r,
         |    (ids.base*17 + x.range*11 + y.range*3) % 256 AS g,
         |    (ids.base*23 + x.range*5 + y.range*19) % 256 AS b
         |  FROM ids CROSS JOIN range($ImgW) x CROSS JOIN range($ImgH) y),
         |lm AS (SELECT fid, (y // 4) * 4 + (x // 4) AS cell,
         |    299*r + 587*g + 114*b AS luma FROM px),
         |cs AS (SELECT fid, cell, CAST(sum(luma) AS BIGINT) AS csum
         |       FROM lm GROUP BY 1, 2),
         |tt AS (SELECT fid, CAST(sum(luma) AS BIGINT) AS total
         |       FROM lm GROUP BY 1),
         |hs AS (SELECT cs.fid, CAST(sum(CASE WHEN cs.csum * 12 > tt.total
         |           THEN (1::BIGINT << cell) ELSE 0 END) AS BIGINT) AS ahash
         |       FROM cs JOIN tt ON tt.fid = cs.fid GROUP BY cs.fid)
         |SELECT a.fid AS doc_a, b.fid AS doc_b, a.ahash
         |FROM hs a JOIN hs b ON a.ahash = b.ahash AND a.fid < b.fid
         |ORDER BY doc_a, doc_b""".stripMargin,

    // the fingerprint replay: base + bumped-sample variants, |s| energy
    // per k*12 DIV n band, the strict bandSum*12 > total threshold,
    // equal-(length, fp) pairs
    "q_audio_fingerprint_dedup" ->
      s"""WITH ids AS (
         |  SELECT range AS fid, range AS base, FALSE AS bump FROM range($NAfpBase)
         |  UNION ALL
         |  SELECT 1000 + range, range, TRUE FROM range($NAfpVar)),
         |sm AS (SELECT ids.fid, 400 + 13 * ids.base AS n, k.range AS k,
         |    CASE WHEN ids.bump AND k.range = 0
         |      THEN ((ids.base*7919 + k.range*31) % 65536 + 1) % 65536
         |      ELSE (ids.base*7919 + k.range*31) % 65536 END AS v
         |  FROM ids CROSS JOIN range(400 + 13 * ($NAfpBase - 1)) k
         |  WHERE k.range < 400 + 13 * ids.base),
         |ab AS (SELECT fid, n, (k * 12) // n AS band, abs(v - 32768) AS a
         |  FROM sm),
         |bs AS (SELECT fid, n, band, CAST(sum(a) AS BIGINT) AS bsum
         |  FROM ab GROUP BY 1, 2, 3),
         |tt AS (SELECT fid, CAST(sum(a) AS BIGINT) AS total
         |  FROM ab GROUP BY 1),
         |hs AS (SELECT bs.fid, CAST(max(bs.n) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN bs.bsum * 12 > tt.total
         |      THEN (1::BIGINT << band) ELSE 0 END) AS BIGINT) AS fp
         |  FROM bs JOIN tt ON tt.fid = bs.fid GROUP BY bs.fid)
         |SELECT a.fid AS doc_a, b.fid AS doc_b, a.n AS n_samples, a.fp
         |FROM hs a JOIN hs b ON a.n = b.n AND a.fp = b.fp AND a.fid < b.fid
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_audio_decode" ->
      s"""SELECT d.range AS doc_id, CAST($SampleRate AS INT) AS sample_rate,
         |  CAST(400 + 13 * d.range AS BIGINT) AS n_samples,
         |  CAST(sum(abs((d.range*7919 + k.range*31) % 65536 - 32768)) AS BIGINT) AS sum_abs
         |FROM range($NClips) d CROSS JOIN range(400 + 13 * ($NClips - 1)) k
         |WHERE k.range < 400 + 13 * d.range
         |GROUP BY d.range ORDER BY doc_id""".stripMargin)
}
