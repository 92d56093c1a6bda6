package graft.multimodal

import graft.SparkSpecBase

/** B123 audio energy-band fingerprint — the ImagePhashSpec convention for
  * the WAV side: the decoder is pinned against a driver-side closed-form
  * reference, the robustness/sensitivity pair is demonstrated (one-sample
  * bump keeps the hash, a structural change moves it), and the catalog
  * fixture's planted variants collide with exactly their bases. */
class AudioFpSpec extends SparkSpecBase {

  /** A 16-bit mono PCM WAV with the given signed samples. */
  private def wav(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
    val dataLen = 2 * samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(rate)
      .putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Driver-side reference fingerprint — independent of the decoder. */
  private def refFp(samples: Array[Short], bands: Int): Long = {
    val n = samples.length
    val acc = new Array[Long](bands)
    var total = 0L
    samples.zipWithIndex.foreach { case (s, k) =>
      val a = math.abs(s.toLong)
      acc((k.toLong * bands / n).toInt) += a
      total += a
    }
    (0 until bands).foldLeft(0L) { (h, b) =>
      if (acc(b) * bands > total) h | (1L << b) else h
    }
  }

  private def clipSamples(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(k => (((id * 7919 + k * 31) % 65536) - 32768).toShort)

  test("decoded fingerprint equals the closed-form reference on varied clips") {
    Seq((0L, 400), (7L, 491), (23L, 699)).foreach { case (id, n) =>
      val s = clipSamples(id, n)
      val got = Multimodal.decodeAudioBandHash(id, wav(s), bands = 12)
      assert(got.n_samples === n.toLong, s"clip $id n_samples")
      assert(got.fp === refFp(s, 12), s"clip $id fingerprint")
    }
  }

  test("one-sample bump keeps the fingerprint; silencing half the clip moves it") {
    val base = clipSamples(3L, 439)
    val fp0 = Multimodal.decodeAudioBandHash(3L, wav(base), 12).fp
    val bumped = base.clone()
    bumped(0) = ((((3L * 7919) % 65536 + 1) % 65536) - 32768).toShort
    assert(Multimodal.decodeAudioBandHash(1003L, wav(bumped), 12).fp === fp0,
      "a one-sample bump moved the fingerprint — too brittle for dedup")
    val silenced = base.clone()
    (0 until base.length / 2).foreach(silenced(_) = 0)
    assert(Multimodal.decodeAudioBandHash(9999L, wav(silenced), 12).fp !== fp0,
      "halving the energy profile did not move the fingerprint — " +
        "the hash carries no signal")
  }

  test("constant-amplitude clip fingerprints to 0 (strict threshold)") {
    val flat = Array.fill[Short](480)(1000)
    assert(Multimodal.decodeAudioBandHash(1L, wav(flat), 12).fp === 0L)
  }

  test("guards: too few samples for the band count is refused") {
    val tiny = Array.fill[Short](5)(100)
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeAudioBandHash(1L, wav(tiny), 12)
    }
    assert(e.getMessage.contains("samples"))
  }

  test("catalog fixture: every planted variant collides with exactly its base") {
    val rows = graft.SparkEntry
      .queries("q_audio_fingerprint_dedup")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val expected = (0 until 10).map(b => (b.toLong, 1000L + b)).toSet
    assert(rows.toSet === expected,
      s"pair set diverges from the planted ground truth: ${rows.toSet}")
  }
}
