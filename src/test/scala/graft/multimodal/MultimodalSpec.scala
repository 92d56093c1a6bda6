package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Multimodal plumbing: the stub decoder's arithmetic, the frame-sample
  * generator's fan-out/boundary behavior, and resize's exact bucket
  * assignment — all hand-checkable on tiny payloads.
  */
class MultimodalSpec extends SparkSpecBase {

  private def binDf(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(rows).toDF("doc_id", "content")

  test("StubDecoder: byte stats and rolling checksum on a known payload") {
    val f = Multimodal.StubDecoder.decode(7L, Array[Byte](1, 2, 3))
    assert(f.n_bytes === 3 && f.max_byte === 3)
    assert(f.mean_byte === 2.0)
    // ((1*31+1)*31+2)*31+3 = 32*31+2=994; 994*31+3=30817
    assert(f.checksum === 30817L)
  }

  test("frameSample keeps every stride-th frame and truncates the tail frame") {
    // 10 bytes, frameLen=4 → frames [0,4),[4,8),[8,10); stride=2 keeps 0 and 2
    val bytes = (1 to 10).map(_.toByte).toArray
    val out = Multimodal.frameSample(spark, binDf(Seq((1L, bytes))),
        frameLen = 4, stride = 2)
      .orderBy(col("frame_idx"))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq === Seq((0, 4, 1L + 2 + 3 + 4), (2, 2, 9L + 10)))
  }

  test("keyframes: first kept, static dropped, jump kept, threshold strict") {
    // B127 on a hand-built payload, frameLen=4, changeDen=20:
    //   frame 0: [10,10,10,10] sum 40 -> kept (first)
    //   frame 1: [10,10,10,11] sum 41 -> |1|*20=20 <= 40 -> dropped
    //   frame 2: [10,10,10,13] sum 43 -> |2|*20=40 <= 41 -> dropped (BOUNDARY
    //            CASE would be |Δ|*20 == prev exactly; strict > drops it)
    //   frame 3: [50,50,50,50] sum 200 -> |157|*20 >> 43 -> kept (scene cut)
    //   frame 4: [50,50,50,50] sum 200 -> Δ=0 -> dropped
    val bytes = Array[Byte](10, 10, 10, 10, 10, 10, 10, 11, 10, 10, 10, 13,
      50, 50, 50, 50, 50, 50, 50, 50)
    val kept = Multimodal.keyframes(spark, binDf(Seq((1L, bytes))),
        frameLen = 4, changeDen = 20)
      .orderBy(col("frame_idx")).collect().map(_.getInt(1)).toSeq
    assert(kept === Seq(0, 3), s"kept frames: $kept")
    // the exact-boundary strictness: prev=40, delta=2 -> 2*20=40, NOT > 40
    val b2 = Array[Byte](10, 10, 10, 10, 10, 10, 10, 12)
    val kept2 = Multimodal.keyframes(spark, binDf(Seq((1L, b2))),
        frameLen = 4, changeDen = 20)
      .collect().map(_.getInt(1)).toSeq
    assert(kept2 === Seq(0), "boundary |delta|*den == prev must be dropped")
  }

  test("frameSample of an empty payload emits no frames") {
    assert(Multimodal.frameSample(spark,
      binDf(Seq((1L, Array.emptyByteArray)))).count() === 0)
  }

  test("resize assigns bytes to buckets by i*nPx div n, covering all input") {
    // 10 bytes into 4 buckets: i*4/10 → [0,0,0, 1,1, 2,2,2, 3,3]
    val bytes = (1 to 10).map(_.toByte).toArray
    val out = Multimodal.resize(spark, binDf(Seq((1L, bytes))), nPx = 4)
      .orderBy(col("px"))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0, 1L + 2 + 3, 3L), (1, 4L + 5, 2L), (2, 6L + 7 + 8, 3L), (3, 9L + 10, 2L)))
    assert(out.map(_._3).sum === bytes.length)
  }

  test("resize with fewer bytes than pixels emits only occupied buckets") {
    val out = Multimodal.resize(spark, binDf(Seq((1L, Array[Byte](5)))), nPx = 16)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0, 5L, 1L)))
  }

  test("image decode round-trips an in-memory PNG exactly and fails loud on garbage") {
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3)
      img.setRGB(x, y, (x * 10 << 16) | (y * 20 << 8) | 7)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = Multimodal.decodeImage(9L, bos.toByteArray)
    assert(f == Multimodal.ImageFeatures(9L, 3, 2,
      sum_r = 2L * (0 + 10 + 20), sum_g = 3L * (0 + 20), sum_b = 6L * 7))
    // a corrupt payload must throw, never emit fabricated features
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(10L, Array[Byte](1, 2, 3, 4))
    }
  }

  test("image decode round-trips a block-uniform gray JPEG exactly (the q_image_decode_jpeg envelope)") {
    // the lossy-codec exactness envelope the JPEG catalog entry relies on:
    // 8x8-block-uniform gray content at compression quality 1.0 is DC-only
    // per block with Cb=Cr=128 exactly, so encode->decode is bit-exact and
    // a closed-form pixel formula stays oracle-checkable (see Media.jpegDir)
    val (w, h) = (16, 12)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var want = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = ((7 * 37 + (x / 8) * 59 + (y / 8) * 83) % 256)
      want += g
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val jw = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = jw.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      jw.setOutput(ios)
      jw.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); jw.dispose() }
    val f = Multimodal.decodeImage(7L, bos.toByteArray)
    assert(f == Multimodal.ImageFeatures(7L, w, h, want, want, want))
  }

  /** Encode one block-uniform gray JPEG at quality 1.0 (the exactness
    * envelope above). */
  private def grayJpeg(seed: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = ((seed * 37 + (x / 8) * 59 + (y / 8) * 83) % 256)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val jw = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val pr = jw.getDefaultWriteParam
    pr.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    pr.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      jw.setOutput(ios)
      jw.write(null, new javax.imageio.IIOImage(img, null, null), pr)
    } finally { ios.close(); jw.dispose() }
    bos.toByteArray
  }

  /** Insert an APPn segment right after a JPEG's SOI whose PAYLOAD
    * contains an embedded SOI sequence (FF D8 FF) — the EXIF-thumbnail
    * shape that splits a raw FF D8 FF byte scan mid-frame. */
  private def withExifLikeApp1(jpeg: Array[Byte]): Array[Byte] = {
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0,
      0xff.toByte, 0xd8.toByte, 0xff.toByte, // the trap: a thumbnail SOI
      1, 2, 3, 4)
    val len = payload.length + 2
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  test("mjpeg splitter skips an EXIF-like APP1 with an embedded thumbnail SOI (r15 advice)") {
    // two frames; frame 0 carries an APP1 whose payload contains FF D8 FF.
    // A raw byte scan splits frame 0 at the thumbnail SOI: the fragment
    // still DECODES (the real frame body follows), so it silently
    // mis-features — three frames, wrong sums. The segment walk must
    // return exactly two frames with the same features as the header-free
    // stream.
    val f0 = grayJpeg(3)
    val f1 = grayJpeg(200) // different content → second frame is a keyframe
    def run(v: Array[Byte]) =
      Multimodal.mjpegKeyframes(spark, binDf(Seq((1L, v))), changeDen = 20)
        .orderBy(col("frame_idx"))
        .collect().map(r => (r.getInt(1), r.getLong(4))).toSeq
    val plain = run(f0 ++ f1)
    val withApp1 = run(withExifLikeApp1(f0) ++ f1)
    assert(withApp1 === plain,
      "APP1 thumbnail SOI changed the split — the segment walk regressed " +
        "to a raw byte scan")
    assert(plain.map(_._1) === Seq(0, 1), s"expected both frames kept: $plain")
  }

  test("jpegFrameEnd walks both frames to their own EOI; garbage fails loudly") {
    val f0 = withExifLikeApp1(grayJpeg(5))
    val f1 = grayJpeg(9)
    val v = f0 ++ f1
    val e0 = Multimodal.jpegFrameEnd(1L, v, 0)
    assert(e0 === f0.length, s"frame 0 end $e0 != ${f0.length}")
    assert(Multimodal.jpegFrameEnd(1L, v, e0) === v.length)
    // trailing garbage after the last EOI must fail loudly, not mis-split
    intercept[IllegalArgumentException] {
      val junk = v ++ Array[Byte](1, 2, 3)
      var off = 0
      while (off < junk.length) off = Multimodal.jpegFrameEnd(1L, junk, off)
    }
  }

  test("wav decode rejects a non-RIFF payload instead of misparsing it") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(1L, Array.fill[Byte](64)(0x41))
    }
  }

  private def wavBytes(samples: Array[Short], extraChunk: Boolean = false,
                       format: Short = 1, channels: Short = 1,
                       bits: Short = 16): Array[Byte] = {
    val dataLen = 2 * samples.length
    val listLen = if (extraChunk) 8 + 6 else 0 // odd payload → pad byte
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + listLen + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(bb.capacity - 8)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(format).putShort(channels).putInt(8000)
      .putInt(8000 * 2).putShort(2).putShort(bits)
    if (extraChunk) // a 5-byte LIST chunk (odd → 1 pad byte) before 'data'
      bb.put("LIST".getBytes("US-ASCII")).putInt(5)
        .put("INFOx".getBytes("US-ASCII")).put(0.toByte)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("wav decode walks the chunk list: LIST chunk before data parses identically") {
    val samples = Array[Short](100, -200, 300, -400)
    val plain = Multimodal.decodeWav(1L, wavBytes(samples))
    val listed = Multimodal.decodeWav(1L, wavBytes(samples, extraChunk = true))
    assert(plain == Multimodal.AudioFeatures(1L, 8000, 4, 1000L))
    assert(listed == plain.copy()) // header bytes must never be summed as samples
  }

  test("wav decode rejects non-PCM, multi-channel, and truncated-data payloads") {
    val s = Array[Short](1, 2)
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(1L, wavBytes(s, format = 3)) // IEEE float
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(1L, wavBytes(s, channels = 2))
    }
    val truncated = wavBytes(s).dropRight(2) // data chunk declares 4 bytes, has 2
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(1L, truncated)
    }
  }

  test("wav decode rejects overflow-crafted chunk lengths and short fmt chunks") {
    // a chunk length near Int.MaxValue would wrap `off + 8 + len` negative
    // in Int arithmetic and sail past the bounds check
    val crafted = wavBytes(Array[Short](1, 2))
    val bb = java.nio.ByteBuffer.wrap(crafted)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, Int.MaxValue - 4) // fmt chunk declares ~2^31 bytes
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(1L, crafted)
    }
    // fmt chunk too short to hold the PCM fields read at fmtOff+0..15
    val shortFmt = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shortFmt.put("RIFF".getBytes("US-ASCII")).putInt(28)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(4).putShort(1).putShort(1)
      .put("data".getBytes("US-ASCII")).putInt(4).putShort(5).putShort(6)
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(1L, shortFmt.array())
    }
  }
}
