package graft.llm

import graft.SparkSpec

/** Typed-Dataset multimodal plumbing: decode batch shape, frame fan-out,
  * deterministic stub metadata.
  */
class MultimodalSpec extends SparkSpec {
  import Multimodal._

  private def mediaDs = {
    val s = spark
    import s.implicits._
    // checksum is the adapter's job (a Column over the source payload);
    // literal rows stand in with payload-derived values
    Seq(
      MediaRow(1L, "image", Array.fill(300)('a'.toByte), Vectors.md5Long("a" * 300)),
      MediaRow(2L, "image", "hello".getBytes("UTF-8"), Vectors.md5Long("hello")),
      MediaRow(3L, "image", Array.emptyByteArray, Vectors.md5Long(""))
    ).toDS()
  }

  test("decode yields deterministic stub metadata per row") {
    val out = decode(mediaDs).collect().map(d => d.media_id -> d).toMap
    assert(out(1L).n_bytes == 300L)
    assert(out(1L).width == 64 + ('a'.toInt % 64))
    assert(out(2L).height == 64 + ('e'.toInt % 64))
    assert(out(3L).width == 64 && out(3L).height == 64 && out(3L).n_bytes == 0L)
    // determinism: same payload -> same checksum
    assert(decode(mediaDs).collect().map(_.checksum).toSeq ==
      out.values.toSeq.sortBy(_.media_id).map(_.checksum))
  }

  test("resize keeps target dims and scales byte estimate by area ratio") {
    val out = resize(mediaDs, 128, 128).collect().map(r => r.media_id -> r).toMap
    val (w1, h1) = decodeStub(Array.fill(300)('a'.toByte))
    assert(out(1L).width == 128 && out(1L).height == 128)
    assert(out(1L).est_bytes == 300L * (128L * 128L) / (w1.toLong * h1))
    assert(out(3L).est_bytes == 0L) // empty payload
    // checksum carried through untouched from the adapter
    assert(out(2L).checksum == Vectors.md5Long("hello"))
  }

  test("pngRoundTrip: a real javax.imageio encode/decode preserves dims " +
    "and pixel values") {
    import spark.implicits._
    val specs = Seq(
      ImageSpec(1L, 16, 20, 0xAB01CD),
      ImageSpec(2L, 31, 17, 0x000000),
      ImageSpec(3L, 1, 1, 0xFFFFFF)
    ).toDS()
    val out = pngRoundTrip(specs).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).width == 16 && out(1L).height == 20)
    assert(out(1L).rgb0 == 0xAB01CD)
    assert(out(2L).rgb0 == 0L && out(3L).rgb0 == 0xFFFFFFL)
    // the payload is a genuine PNG, not a stub: magic bytes + nonzero size
    assert(out.values.forall(_.png_bytes > 8))
  }

  test("phashRoundTrip: fingerprint recomputed from DECODED pixels equals " +
    "the spec arithmetic (PNG losslessness, pixel for pixel)") {
    import spark.implicits._
    val pat = 0x0ABCDEF1234567L // arbitrary 60-bit pattern
    val specs = Seq(
      PhashSpec(1L, pat, 0),
      PhashSpec(2L, pat, 59),          // top in-budget bit
      PhashSpec(3L, 0L, 7),            // all-black except one pixel
      PhashSpec(4L, (1L << 60) - 1, 7) // all-white minus one pixel
    ).toDS()
    val out = phashRoundTrip(specs).collect().map(r => r.media_id -> r.phash).toMap
    assert(out(1L) == (pat ^ 1L))
    assert(out(2L) == (pat ^ (1L << 59)))
    assert(out(3L) == (1L << 7))
    assert(out(4L) == (((1L << 60) - 1) ^ (1L << 7)))
  }

  test("resizeRoundTrip: NN upscale + box downscale through two real PNG " +
    "passes is identity on the pattern, and the decoded white count is " +
    "popcount times k-squared") {
    import spark.implicits._
    val pat = 0x0ABCDEF1234567L
    val specs = Seq(
      PhashSpec(1L, pat, 0),
      PhashSpec(2L, 0L, 7),             // single white pixel
      PhashSpec(3L, (1L << 60) - 1, 59) // dense pattern, top bit flipped
    ).toDS()
    for (k <- Seq(1, 3)) {
      val out = resizeRoundTrip(specs, k).collect().map(r => r.media_id -> r).toMap
      assert(out(1L).up_w == 8 * k && out(1L).up_h == 8 * k)
      assert(out(1L).recovered_fp == (pat ^ 1L))
      assert(out(2L).recovered_fp == (1L << 7))
      assert(out(3L).recovered_fp == (((1L << 60) - 1) ^ (1L << 59)))
      for (id <- 1L to 3L)
        assert(out(id).n_white_up ==
          java.lang.Long.bitCount(out(id).recovered_fp).toLong * k * k)
    }
  }

  test("wavRoundTrip: a real javax.sound WAV encode/decode preserves the " +
    "sample count, rate, and PCM16 sample values") {
    import spark.implicits._
    val specs = Seq(
      AudioSpec(1L, 8000, 64),
      AudioSpec(2L, 16000, 255),
      AudioSpec(3L, 12000, 1)
    ).toDS()
    val out = wavRoundTrip(specs).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).n_samples == 64 && out(1L).sample_rate == 8000)
    assert(out(2L).n_samples == 255 && out(2L).sample_rate == 16000)
    // decoded samples match the deterministic generator exactly (lossless)
    def expected(id: Long, i: Long) = ((id * 31 + i * 17) % 65536) - 32768
    assert(out(1L).s0 == expected(1L, 0) && out(1L).s_last == expected(1L, 63))
    assert(out(2L).s0 == expected(2L, 0) && out(2L).s_last == expected(2L, 254))
    assert(out(3L).s0 == expected(3L, 0) && out(3L).s_last == out(3L).s0)
  }

  test("frame sampling fans out ceil(n/256) rows with byte offsets") {
    val frames = sampleFrames(mediaDs).collect().groupBy(_.media_id)
    assert(frames(1L).map(f => (f.frame_no, f.byte_offset)).sorted.toSeq ==
      Seq((0, 0L), (1, 256L)))
    assert(frames(2L).length == 1)
    assert(!frames.contains(3L)) // empty payload -> no frames
  }

  test("gifFramesRoundTrip: one animated container per row, frames decode bit-exactly") {
    val sp = spark
    import sp.implicits._
    val specs = Seq(
      VideoSpec(7L, 3, 2, 3),
      VideoSpec(8L, 2, 4, 1)
    ).toDS()
    val out = gifFramesRoundTrip(specs).collect()
      .map(f => (f.media_id, f.frame_no) -> f).toMap
    assert(out.size == 4, s"expected 3 + 1 frames, got ${out.keySet}")
    (0 until 3).foreach { f =>
      assert(out((7L, f)).width == 3 && out((7L, f)).height == 2)
      assert(out((7L, f)).rgb0 == (frameColor(7L, f) & 0xffffff).toLong,
        s"frame $f pixel drifted through the GIF container")
    }
    assert(out((8L, 0)).rgb0 == (frameColor(8L, 0) & 0xffffff).toLong)
    // the colors actually differ across frames - the container carries
    // real per-frame palettes, not one repeated image
    assert((0 until 3).map(f => out((7L, f)).rgb0).distinct.size == 3)
  }
}
