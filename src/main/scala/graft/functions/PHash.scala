package graft.functions

/** Real perceptual hash: 8×8 low-frequency DCT sign bits over a decoded
  * luma plane — the production form behind the mm07/mm09 decoder
  * contract (ref semantics: content-addressed integrity hashing as in
  * `ola/DatabaseIntegrityCheck.sql`'s CHECKSUM tiers, applied to media).
  *
  * Classic pHash pipeline, fully deterministic:
  *   1. box-average the W×H luma plane to a 32×32 grid (area mapping —
  *      every source pixel contributes to exactly one cell, so the
  *      downsample is decode-size-invariant for integer multiples);
  *   2. 2-D DCT-II, computed PARTIALLY: only the top-left 8×8
  *      (low-frequency) block is ever needed, so the separable transform
  *      is 8×32 row sums then 8×8 column sums — ~16k multiplies, not a
  *      full 32×32 DCT;
  *   3. threshold the 63 AC coefficients at their mean (DC excluded
  *      from the mean AND the bits — it carries absolute brightness,
  *      which near-dup detection must ignore; bit 0 is always 0); bit
  *      (u*8+v) is set when coeff > mean.
  *
  * Exact invariances (PHashSpec pins them): any affine luma change
  * v → a·v + b with a > 0 (no clipping) maps every AC coefficient and
  * their mean through the same scale, so the SIGN pattern — the hash —
  * is bit-identical. Small local perturbations flip few low-frequency
  * signs, which is what makes dd04-style pigeonhole banding on the
  * 64-bit hash (4 segments of 16 bits: hamming ≤ 3 ⇒ ≥ 1 segment
  * identical) a recall-1 candidate generator at that radius.
  *
  * The DECODE step stays the repo's marked deterministic fake (no image
  * codecs in this container); this kernel consumes the decoder
  * contract's output (w, h, luma bytes) and slots into the same
  * per-partition pass — no extra exchange. */
object PHash {
  private final val N = 32
  private final val K = 8

  // c(u)(x) = cos((2x+1)·u·π / (2N)); the DCT-II basis, u < K only
  private val cos: Array[Array[Double]] = Array.tabulate(K, N) { (u, x) =>
    math.cos((2 * x + 1) * u * math.Pi / (2.0 * N))
  }

  /** 64-bit perceptual hash of a W×H luma plane (row-major, unsigned
    * bytes). Planes smaller than 32×32 are upsampled by the same area
    * mapping (cells then share source pixels). */
  def phash64(luma: Array[Byte], w: Int, h: Int): Long = {
    require(w > 0 && h > 0 && luma.length == w * h,
      s"luma plane must be w*h bytes, got ${luma.length} for ${w}x$h")
    // 1. area-mapped 32×32 downsample
    val g = new Array[Double](N * N)
    var ty = 0
    while (ty < N) {
      val y0 = ty * h / N
      val y1 = math.max(y0 + 1, (ty + 1) * h / N)
      var tx = 0
      while (tx < N) {
        val x0 = tx * w / N
        val x1 = math.max(x0 + 1, (tx + 1) * w / N)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          val row = y * w
          while (x < x1) { sum += (luma(row + x) & 0xff); x += 1 }
          y += 1
        }
        g(ty * N + tx) = sum / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    // 2. partial separable DCT-II: rows (u<8 over y) then columns (v<8)
    val t = new Array[Double](K * N) // t(u)(y) = Σ_x cos(u)(x) · g(y)(x)
    var u = 0
    while (u < K) {
      var y = 0
      while (y < N) {
        var sum = 0.0
        var x = 0
        while (x < N) { sum += cos(u)(x) * g(y * N + x); x += 1 }
        t(u * N + y) = sum
        y += 1
      }
      u += 1
    }
    val d = new Array[Double](K * K)
    u = 0
    while (u < K) {
      var v = 0
      while (v < K) {
        var sum = 0.0
        var y = 0
        while (y < N) { sum += cos(v)(y) * t(u * N + y); y += 1 }
        d(u * K + v) = sum
        v += 1
      }
      u += 1
    }
    // 3. mean of the 63 AC coefficients; bit (u*8+v) set when above.
    // The DC coefficient (i=0) is excluded from BOTH the mean and the
    // bit loop (bit 0 is always 0, classic pHash): a DC-vs-AC-mean bit
    // would compare absolute brightness against texture energy — a
    // near-constant bit outside the affine-luma invariance (a large
    // brightness offset b on a dark image can flip it) that wastes hash
    // capacity the banding then relies on.
    var mean = 0.0
    var i = 1
    while (i < K * K) { mean += d(i); i += 1 }
    mean /= (K * K - 1)
    var bits = 0L
    i = 1
    while (i < K * K) {
      if (d(i) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** The 16-lowercase-hex rendering mm07/mm09's banding operates on. */
  def hex(bits: Long): String = f"$bits%016x"

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
