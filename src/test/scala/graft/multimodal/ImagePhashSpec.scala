package graft.multimodal

import graft.SparkSpecBase

/** B115 perceptual-hash image dedup: the aHash integer contract against a
  * driver-side recompute on synthetic images, the planted-near-dup
  * collision property the catalog fixture relies on, hash divergence on a
  * real edit, and the grid-shape guard.
  */
class ImagePhashSpec extends SparkSpecBase {

  private def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Driver-side reference aHash from raw pixel ints (no shared decode). */
  private def refHash(w: Int, h: Int, px: (Int, Int) => Int): Long = {
    val cells = new Array[Long](12)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(x, y)
      val luma = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
        114L * (p & 0xff)
      cells((y / (h / 3)) * 4 + (x / (w / 4))) += luma
      total += luma
    }
    (0 until 12).foldLeft(0L) { (acc, c) =>
      if (cells(c) * 12 > total) acc | (1L << c) else acc
    }
  }

  test("decoded aHash equals the pixel-formula reference on varied images") {
    for (seed <- 1 to 8) {
      def px(x: Int, y: Int): Int = {
        val r = (seed * 31 + x * 7 + y * 13) % 256
        val g = (seed * 17 + x * 11 + y * 3) % 256
        val b = (seed * 23 + x * 5 + y * 19) % 256
        (r << 16) | (g << 8) | b
      }
      val got = Multimodal.decodeAHash(seed.toLong, png(16, 12)(px))
      assert(got.ahash === refHash(16, 12, px), s"seed $seed")
      assert(got.width === 16 && got.height === 12)
    }
  }

  test("one-pixel perturbation keeps the hash; inversion changes it") {
    def base(x: Int, y: Int): Int = {
      val v = (x * 37 + y * 91) % 256
      (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256)
    }
    val h0 = Multimodal.decodeAHash(1L, png(16, 12)(base)).ahash
    val bumped = Multimodal.decodeAHash(2L, png(16, 12) { (x, y) =>
      if (x == 0 && y == 0) base(0, 0) ^ 0x010000 else base(x, y)
    }).ahash
    val inverted = Multimodal.decodeAHash(3L, png(16, 12) { (x, y) =>
      base(x, y) ^ 0xffffff
    }).ahash
    assert(bumped === h0, "a one-pixel edit must not move the hash")
    assert(inverted !== h0, "inversion must move the hash")
  }

  test("constant image hashes to 0 (strict threshold)") {
    assert(Multimodal.decodeAHash(1L, png(16, 12)((_, _) => 0x808080)).ahash === 0L)
  }

  test("grid-shape guard rejects incompatible dimensions") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeAHash(1L, png(15, 12)((_, _) => 0))
    }
  }

  test("catalog fixture: every planted variant collides with exactly its base") {
    val pairs = graft.SparkEntry.queries("q_image_phash_dedup")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = pairs.filter { case (a, b) => b == a + 1000 }
    assert(planted.length === 10, s"all 10 planted near-dups must collide: $planted")
  }
}
