package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PHash

/** The real 8×8 luma-DCT pHash kernel: exact invariances, near-dup
  * robustness, discrimination, and the pigeonhole-banding recall claim
  * mm09's shape relies on — all on synthetic images (no codecs in this
  * container; the decode stays the marked fake, the KERNEL is real). */
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
