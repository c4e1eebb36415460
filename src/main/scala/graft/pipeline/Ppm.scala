package graft.pipeline

/** Pure-Scala decoder for the two codec-free Netpbm raster formats —
  * binary PPM (P6, RGB) and PGM (P5, grayscale) — so ONE real end-to-end
  * decode path exists behind the multimodal decoder contract without any
  * image libraries in the container (VERDICT r8 gap #4). The container
  * ships no libjpeg/ffmpeg, but P5/P6 need ~40 lines: an ASCII header
  * (magic, width, height, maxval, '#' comments allowed) followed by raw
  * sample bytes.
  *
  * Output is the decoder contract's (w, h, luma) — 0..255 row-major
  * bytes: P5 samples pass through (rescaled when maxval < 255), P6
  * converts with the integer BT.601 weights (299·R + 587·G + 114·B)/1000,
  * all integer arithmetic so engines and runs agree bit-for-bit.
  *
  * FIXTURE TRICK the specs rely on: a PPM whose header AND samples are
  * all ≤ 0x7F is byte-for-byte valid single-byte UTF-8, so it survives
  * the corpus plumbing's `encode(text, 'utf-8')` round trip unchanged —
  * a `documents.text` column can CARRY real images (maxval 127) and
  * mm-tier queries decode genuinely real pixels with zero schema change.
  */
object Ppm {

  /** Binary PPM/PGM encoder (fixture generation + round-trip specs).
    * maxval 127 keeps every byte ASCII-safe (see the class doc). */
  def encodeP6(w: Int, h: Int, rgb: Array[Byte],
      maxval: Int = 127): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb must be w*h*3, got ${rgb.length}")
    header("P6", w, h, maxval) ++ rgb
  }

  def encodeP5(w: Int, h: Int, gray: Array[Byte],
      maxval: Int = 127): Array[Byte] = {
    require(gray.length == w * h, s"gray must be w*h, got ${gray.length}")
    header("P5", w, h, maxval) ++ gray
  }

  private def header(magic: String, w: Int, h: Int, maxval: Int) = {
    require(maxval > 0 && maxval <= 255, s"maxval must be 1..255: $maxval")
    s"$magic\n$w $h\n$maxval\n".getBytes("US-ASCII")
  }

  /** Decode a P5/P6 payload to the contract's (w, h, luma 0..255), or
    * None when the payload is not a complete binary PPM/PGM — callers
    * fall back to the marked fake for non-PPM bytes, so the corpus never
    * needs to be all-images. */
  def tryDecodeLuma(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 10) return None
    val magic = new String(payload, 0, 2, "US-ASCII")
    if (magic != "P5" && magic != "P6") return None
    var pos = 2
    // header tokens: width, height, maxval — whitespace-separated, '#'
    // comments run to end-of-line (the Netpbm grammar)
    def nextInt(): Option[Int] = {
      while (pos < payload.length &&
          (isSpace(payload(pos)) || payload(pos) == '#')) {
        if (payload(pos) == '#')
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < payload.length && payload(pos) >= '0' &&
        payload(pos) <= '9') pos += 1
      // cap at 9 digits: anything longer is not a plausible dimension and
      // would overflow toInt — malformed bytes must yield None, never a
      // NumberFormatException out of a decode that promises totality
      if (pos == start || pos - start > 9) None
      else Some(new String(payload, start, pos - start, "US-ASCII").toInt)
    }
    val parsed = for {
      w <- nextInt(); h <- nextInt(); maxval <- nextInt()
    } yield (w, h, maxval)
    parsed.flatMap { case (w, h, maxval) =>
      // exactly ONE whitespace byte separates maxval from raster data
      if (pos >= payload.length || !isSpace(payload(pos))) None
      else {
        pos += 1
        val channels = if (magic == "P6") 3 else 1
        val need = w.toLong * h * channels
        if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 ||
            payload.length - pos < need) None
        else {
          val luma = new Array[Byte](w * h)
          var i = 0
          while (i < w * h) {
            val v =
              if (channels == 1) payload(pos + i) & 0xff
              else {
                val o = pos + i * 3
                (299 * (payload(o) & 0xff) + 587 * (payload(o + 1) & 0xff) +
                  114 * (payload(o + 2) & 0xff)) / 1000
              }
            // rescale to the contract's full 0..255 range; /maxval is
            // exact for 255 (identity) and deterministic otherwise
            luma(i) = (v * 255 / maxval).toByte
            i += 1
          }
          Some((w, h, luma))
        }
      }
    }
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'
}
