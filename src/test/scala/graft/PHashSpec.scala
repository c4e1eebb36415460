package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PHash

/** The real 8×8 luma-DCT pHash kernel: exact invariances, near-dup
  * robustness, discrimination, and the pigeonhole-banding recall claim
  * mm09's shape relies on — on synthetic planes AND on truly decoded
  * pixels via the pure-Scala PPM decoder ([[graft.pipeline.Ppm]] — the
  * one codec-free format this container can decode end-to-end for real;
  * non-PPM payloads still fall back to the marked fake). */
class PHashSpec extends AnyFunSuite {

  /** Smooth full-spectrum synthetic image: a seeded cosine-basis mixture
    * with 1/sqrt(1+u+v) amplitude decay over the whole 8×8 low-frequency
    * block and magnitudes bounded away from zero — what downsampled
    * photographs look like to a DCT (every low-frequency coefficient
    * carries real signal, so sign bits are signal-dominated, not
    * noise-dominated the way a pure two-sinusoid image's near-zero
    * coefficients would be). */
  private def img(seed: Int, w: Int = 64, h: Int = 64): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val amps = Array.tabulate(8, 8) { (u, v) =>
      if (u == 0 && v == 0) 0.0
      else {
        val sign = if (rnd.nextBoolean()) 1.0 else -1.0
        sign * (0.5 + 0.5 * rnd.nextDouble()) * 90.0 /
          math.sqrt(1.0 + u + v)
      }
    }
    val scale = 110.0 / amps.flatten.map(math.abs).sum
    val out = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8)
        s += amps(u)(v) * math.cos(math.Pi * u * (x + 0.5) / w) *
          math.cos(math.Pi * v * (y + 0.5) / h)
      val vv = 128 + s * scale
      out(y * w + x) = math.max(0, math.min(255, vv.round.toInt)).toByte
    }
    out
  }

  private def withNoise(base: Array[Byte], seed: Int,
      amp: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    base.map { b =>
      val v = (b & 0xff) + rnd.nextInt(2 * amp + 1) - amp
      math.max(0, math.min(255, v)).toByte
    }
  }

  test("exact invariance under affine luma transform (no clipping)") {
    // v -> a*v + b scales every AC coefficient and their mean alike, so
    // the sign pattern is bit-identical — brightness/contrast changes
    // never move the hash
    for (seed <- 1 to 10) {
      val base = img(seed)
      // keep 0.5*v + 40 inside [40, 167] — no clipping anywhere
      val affine = base.map(b => (((b & 0xff) / 2) + 40).toByte)
      assert(PHash.phash64(base, 64, 64) === PHash.phash64(affine, 64, 64),
        s"seed $seed")
    }
  }

  test("decode-size invariance: integer-multiple upsampling") {
    // the area mapping makes a 2x-upscaled plane average back to the
    // same 32x32 grid, so the hash is identical — decode resolution
    // must not move the hash (exact when 32 divides both dims; other
    // sizes land within the banding radius via the near-dup property)
    for (seed <- 1 to 5) {
      val w = 64; val h = 64
      val base = img(seed, w, h)
      val up = new Array[Byte](w * 2 * h * 2)
      for (y <- 0 until h * 2; x <- 0 until w * 2)
        up(y * w * 2 + x) = base(y / 2 * w + x / 2)
      assert(PHash.phash64(base, w, h) === PHash.phash64(up, w * 2, h * 2),
        s"seed $seed")
    }
  }

  test("near-dups land within banding radius; distinct images far apart") {
    val nearDists = for (seed <- 1 to 20) yield {
      val base = img(seed)
      PHash.hamming(PHash.phash64(base, 64, 64),
        PHash.phash64(withNoise(base, seed + 1000, amp = 4), 64, 64))
    }
    // pigeonhole banding on 4 x 16-bit segments catches every pair with
    // hamming <= 3 (4 flipped bits could hit all 4 segments)
    assert(nearDists.max <= 3,
      s"noisy twin drifted past banding radius: $nearDists")
    val farDists = for {
      a <- 1 to 8; b <- (a + 1) to 8
    } yield PHash.hamming(PHash.phash64(img(a), 64, 64),
      PHash.phash64(img(b), 64, 64))
    assert(farDists.min >= 10,
      s"distinct images too close for banding to discriminate: $farDists")
  }

  test("pigeonhole banding recall is 1.0 at hamming <= 3 on synthetic pairs") {
    // the mm09 shape: 4 segments of 4 hex chars; a candidate surfaces
    // when ANY segment matches. Every near-dup pair above (hamming <= 3)
    // must share >= 1 segment — by pigeonhole, 3 flips cannot touch all
    // 4 segments
    var caught = 0
    var total = 0
    for (seed <- 1 to 20) {
      val a = PHash.hex(PHash.phash64(img(seed), 64, 64))
      val b = PHash.hex(PHash.phash64(
        withNoise(img(seed), seed + 1000, amp = 4), 64, 64))
      total += 1
      if ((0 until 4).exists(i =>
        a.substring(i * 4, i * 4 + 4) == b.substring(i * 4, i * 4 + 4)))
        caught += 1
    }
    assert(caught === total, s"banding recall $caught/$total")
  }

  /** ASCII-safe (all bytes ≤ 0x7F) smooth RGB image as raw P6 samples:
    * the [[img]] generator's cosine mixture, re-ranged into [9, 119]
    * and replicated per channel with small fixed offsets, so the PPM
    * payload survives a utf-8 text round trip byte-for-byte. */
  private def rgbImg(seed: Int, w: Int = 48, h: Int = 48): Array[Byte] = {
    val g = img(seed, w, h)
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      // img() emits 128±110; map to 64±55 and clamp channel offsets in
      val v = 64 + ((g(i) & 0xff) - 128) * 55 / 110
      out(i * 3) = math.min(119, v + 2).toByte
      out(i * 3 + 1) = v.toByte
      out(i * 3 + 2) = math.max(9, v - 2).toByte
      i += 1
    }
    out
  }

  test("PPM: P6/P5 round-trip through the real decoder, exact header " +
      "grammar, graceful None on junk") {
    import graft.pipeline.Ppm
    val rgb = rgbImg(3)
    val p6 = Ppm.encodeP6(48, 48, rgb)
    val (w, h, luma) = Ppm.tryDecodeLuma(p6).get
    assert((w, h) === (48, 48))
    // BT.601 integer luma of the first pixel, rescaled 127 -> 255
    val exp = (299 * (rgb(0) & 0xff) + 587 * (rgb(1) & 0xff) +
      114 * (rgb(2) & 0xff)) / 1000 * 255 / 127
    assert((luma(0) & 0xff) === exp)
    // P5 passes samples through (rescaled)
    val gray = Array.tabulate(16)(i => (i * 8).toByte)
    val (w5, h5, l5) = Ppm.tryDecodeLuma(Ppm.encodeP5(4, 4, gray)).get
    assert((w5, h5) === (4, 4))
    assert((l5(5) & 0xff) === (gray(5) & 0xff) * 255 / 127)
    // comment-bearing header parses (the Netpbm grammar)
    val commented = ("P5\n# a comment line\n4 4\n# another\n127\n"
      .getBytes("US-ASCII")) ++ gray
    assert(Ppm.tryDecodeLuma(commented).nonEmpty)
    // junk, truncation, wrong magic -> None, never a throw
    assert(Ppm.tryDecodeLuma("not an image at all".getBytes).isEmpty)
    assert(Ppm.tryDecodeLuma(p6.take(p6.length - 5)).isEmpty)
    assert(Ppm.tryDecodeLuma("P3\n2 2\n255\n".getBytes).isEmpty)
    assert(Ppm.tryDecodeLuma(Array.empty[Byte]).isEmpty)
    // an absurd dimension must be rejected, not overflow Int.parseInt
    assert(Ppm.tryDecodeLuma(
      "P5\n99999999999999999999 4\n127\n0000000000000000".getBytes).isEmpty)
  }

  test("banding recall 1.0 on TRULY DECODED pixels: real P6 images " +
      "through Ppm.tryDecodeLuma -> PHash") {
    import graft.pipeline.Ppm
    // the r8 gap: the banding-recall claim only ever ran on synthetic
    // planes. Here every plane comes out of the REAL decoder: 20 images
    // encoded as binary P6, their near-dup twins perturbed IN PIXEL
    // SPACE before encoding, hashes from the decoded luma only.
    def decodedHash(rgb: Array[Byte]): Long = {
      val (w, h, luma) = Ppm.tryDecodeLuma(Ppm.encodeP6(48, 48, rgb)).get
      PHash.phash64(luma, w, h)
    }
    def noisy(rgb: Array[Byte], seed: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      rgb.map { b =>
        val v = (b & 0xff) + rnd.nextInt(5) - 2
        math.max(0, math.min(127, v)).toByte
      }
    }
    var caught = 0
    for (seed <- 1 to 20) {
      val a = decodedHash(rgbImg(seed))
      val b = decodedHash(noisy(rgbImg(seed), seed + 500))
      assert(PHash.hamming(a, b) <= 3,
        s"decoded near-dup drifted past banding radius (seed $seed): " +
          PHash.hamming(a, b))
      val ah = PHash.hex(a); val bh = PHash.hex(b)
      if ((0 until 4).exists(i =>
        ah.substring(i * 4, i * 4 + 4) == bh.substring(i * 4, i * 4 + 4)))
        caught += 1
    }
    assert(caught === 20, s"banding recall on decoded pixels: $caught/20")
    // distinct decoded images stay far apart
    val far = for { a <- 1 to 6; b <- (a + 1) to 6 }
      yield PHash.hamming(decodedHash(rgbImg(a)), decodedHash(rgbImg(b)))
    assert(far.min >= 10, s"decoded distinct images too close: $far")
  }

  test("end-to-end: a documents corpus CARRYING real PPM payloads flows " +
      "real pixels through realPhashFrame and realDecodeMeta") {
    import SparkTestSession._
    import spark.implicits._
    import graft.pipeline.{Multimodal, Ppm}
    // ASCII-safe P6 bytes survive text <-> utf-8 exactly (every byte
    // <= 0x7F is a 1-byte UTF-8 code point)
    def asText(p: Array[Byte]): String = new String(p, "UTF-8")
    val base = rgbImg(7)
    val twin = base.clone(); twin(100) = (twin(100) + 2).toByte
    val dir = java.nio.file.Files.createTempDirectory("graft-ppm").toString
    Seq(
      (1L, asText(Ppm.encodeP6(48, 48, base)), "en", "img", 0L),
      (2L, asText(Ppm.encodeP6(48, 48, twin)), "en", "img", 0L),
      (3L, "just a plain text document with no image bytes", "en", "web", 46L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val hashes = Multimodal.realPhashFrame(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // docs 1/2 hash from REAL decoded pixels: a 1-pixel twin lands at
    // hamming <= 2, and both differ from the text doc's fake-plane hash
    val d12 = PHash.hamming(
      java.lang.Long.parseUnsignedLong(hashes(1L), 16),
      java.lang.Long.parseUnsignedLong(hashes(2L), 16))
    assert(d12 <= 2, s"1-pixel twin at hamming $d12")
    assert(hashes(1L) !== hashes(3L))
    // metadata: real dimensions + format for images, fake for text
    val payload1 = Ppm.encodeP6(48, 48, base)
    val m1 = Multimodal.realDecodeMeta(1L, payload1)
    assert((m1.format, m1.width, m1.height, m1.n_frames) ===
      ("ppm", 48, 48, 1))
    assert(m1.n_bytes === payload1.length)
    val m3 = Multimodal.realDecodeMeta(3L,
      "just a plain text document with no image bytes".getBytes("UTF-8"))
    assert(m3.format !== "ppm") // the marked fake governs non-PPM bytes
  }

  test("realPhashFrame: decoder-contract plumbing emits 16-hex hashes") {
    import SparkTestSession._
    val rows = graft.pipeline.Multimodal
      .realPhashFrame(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1).matches("[0-9a-f]{16}"), r.getString(1))
    }
    // determinism across runs (the whole point of the contract)
    val again = graft.pipeline.Multimodal
      .realPhashFrame(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) === r.getString(1)))
  }
}
