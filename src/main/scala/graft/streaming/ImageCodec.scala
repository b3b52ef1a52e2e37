package graft.streaming

/** Self-contained image codec + DCT perceptual hash — the "real pixel"
  * path behind [[MultimodalPipeline.phashPixelPairs]].
  *
  * This container ships no image libraries, so the two uncompressed
  * formats every toolchain can emit are implemented from their public
  * specs: 24-bit bottom-up BMP (BITMAPINFOHEADER) and binary PPM (P6).
  * That is enough to make the perceptual-hash contract REAL: the same
  * pixels encoded through either format decode to the same raster and
  * therefore hash identically, while byte-level signatures (the
  * codec-free [[MultimodalPipeline.perceptualHash60]]) see two unrelated
  * blobs. Swapping in a JPEG/PNG decoder later only widens `decode`;
  * nothing downstream changes.
  *
  * The hash is the classic DCT pHash (public domain, the pHash.org
  * construction): grayscale → area-average resize to 32×32 → 2D DCT-II
  * → keep the 8×8 low-frequency block → drop DC → threshold the first
  * 60 AC coefficients (zigzag order) against their median. 60 bits, so
  * the banded-hamming LSH machinery shared with the text SimHash path
  * ([[graft.operators.Dedup.bandedHammingPairs]]) applies unchanged.
  * Robustness comes from the resize + low-pass: per-pixel noise and
  * format round-trips leave the low-frequency coefficients (hence the
  * hash) nearly unchanged, while genuinely different images differ in
  * ~half the bits. All arithmetic is fixed-order double ops on decoded
  * bytes — bit-deterministic across partitions and runs.
  */
object ImageCodec {

  /** Decoded raster: row-major top-down grayscale in [0, 255]. */
  final case class Gray(width: Int, height: Int, pixels: Array[Double])

  // ── encoders (test-image construction; deterministic, spec-exact) ──

  /** 24-bit uncompressed bottom-up BMP with BITMAPINFOHEADER; rows
    * padded to 4 bytes per the format spec. `rgb(x, y)` returns packed
    * 0xRRGGBB for the TOP-DOWN pixel grid. */
  def encodeBmp(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val dataSize = rowBytes * h
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, fileSize); put32(10, 54); put32(14, 40)
    put32(18, w); put32(22, h) // positive height = bottom-up
    out(26) = 1; out(28) = 24
    put32(34, dataSize)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowBytes // bottom-up storage
      var x = 0
      while (x < w) {
        val c = rgb(x, y)
        out(rowOff + x * 3) = (c & 0xff).toByte // B
        out(rowOff + x * 3 + 1) = ((c >> 8) & 0xff).toByte // G
        out(rowOff + x * 3 + 2) = ((c >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Binary PPM (P6, maxval 255): ASCII header + raw top-down RGB. */
  def encodePpm(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = rgb(x, y)
        val off = header.length + (y * w + x) * 3
        out(off) = ((c >> 16) & 0xff).toByte
        out(off + 1) = ((c >> 8) & 0xff).toByte
        out(off + 2) = (c & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // ── decoder ────────────────────────────────────────────────────────

  /** Decode BMP (24-bit uncompressed) or PPM (P6) to grayscale via the
    * ITU-R BT.601 integer luma (299/587/114 per mille — fixed-point, so
    * the gray value is exact and engine-portable). Returns None for
    * payloads that are neither (undecodable blobs stay on the byte-
    * signature path). */
  def decode(bytes: Array[Byte]): Option[Gray] = {
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else None
  }

  private def gray(r: Int, g: Int, b: Int): Double =
    (r * 299 + g * 587 + b * 114) / 1000.0

  private def decodeBmp(bytes: Array[Byte]): Option[Gray] = {
    def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    if (bytes.length < 54) return None
    val dataOff = i32(10)
    val w = i32(18)
    val hRaw = i32(22)
    val bpp = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
    val compression = i32(30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue || bpp != 24 ||
      compression != 0 || dataOff < 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    // Pixel count can never exceed payload bytes for an uncompressed
    // 24-bit format (3 bytes/px), and this check stays exact even when
    // w and h are BOTH near 2^31 (where rowBytes*h would wrap Long) —
    // reject absurd dimensions before forming any other product.
    if (w.toLong * h > bytes.length) return None
    // Long arithmetic: hostile headers (w or h near 2^31) overflow the
    // int products, slipping past the bound check into an allocation or
    // out-of-bounds read; a malformed payload must return None (byte
    // fallback), never crash the task.
    val rowBytesL = (w.toLong * 3 + 3) & ~3L
    if (dataOff + rowBytesL * h > bytes.length) return None
    val rowBytes = rowBytesL.toInt
    val px = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val rowOff = dataOff + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val b = bytes(rowOff + x * 3) & 0xff
        val g = bytes(rowOff + x * 3 + 1) & 0xff
        val r = bytes(rowOff + x * 3 + 2) & 0xff
        px(y * w + x) = gray(r, g, b)
        x += 1
      }
      y += 1
    }
    Some(Gray(w, h, px))
  }

  private def decodePpm(bytes: Array[Byte]): Option[Gray] = {
    // header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw
    var pos = 2
    val fields = new Array[Int](3)
    var f = 0
    while (f < 3) {
      while (pos < bytes.length &&
        (bytes(pos) == ' ' || bytes(pos) == '\n' || bytes(pos) == '\t' ||
          bytes(pos) == '\r')) pos += 1
      if (pos < bytes.length && bytes(pos) == '#') { // comment to EOL
        while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      } else {
        var v = 0
        var any = false
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
          // A >10-digit field would silently wrap Int and decode as a
          // plausible-but-wrong raster; no sane dimension or maxval
          // exceeds 2^24, so reject during accumulation (before wrap).
          if (v > (1 << 24)) return None
        }
        if (!any) return None
        fields(f) = v
        f += 1
      }
    }
    pos += 1 // the single whitespace byte after maxval
    val w = fields(0); val h = fields(1); val maxval = fields(2)
    // Long product: w*h*3 in int overflows for hostile headers (see the
    // BMP guard above).
    if (w <= 0 || h <= 0 || maxval != 255 ||
      pos + w.toLong * h * 3 > bytes.length) return None
    val px = new Array[Double](w * h)
    var i = 0
    while (i < w * h) {
      val r = bytes(pos + i * 3) & 0xff
      val g = bytes(pos + i * 3 + 1) & 0xff
      val b = bytes(pos + i * 3 + 2) & 0xff
      px(i) = gray(r, g, b)
      i += 1
    }
    Some(Gray(w, h, px))
  }

  // ── pHash ──────────────────────────────────────────────────────────

  private val N = 32

  /** Area-average (box-filter) resample to N×N: each target cell
    * integrates the exact source rectangle it covers — the resize used
    * by every pHash implementation, and the step that gives the hash
    * its noise robustness. */
  private def resampleToN(img: Gray): Array[Double] = {
    val out = new Array[Double](N * N)
    val sx = img.width.toDouble / N
    val sy = img.height.toDouble / N
    var ty = 0
    while (ty < N) {
      val y0 = ty * sy; val y1 = (ty + 1) * sy
      var tx = 0
      while (tx < N) {
        val x0 = tx * sx; val x1 = (tx + 1) * sx
        var acc = 0.0
        var y = math.floor(y0).toInt
        while (y < y1 && y < img.height) {
          val wy = math.min(y + 1.0, y1) - math.max(y.toDouble, y0)
          var x = math.floor(x0).toInt
          while (x < x1 && x < img.width) {
            val wx = math.min(x + 1.0, x1) - math.max(x.toDouble, x0)
            acc += img.pixels(y * img.width + x) * wy * wx
            x += 1
          }
          y += 1
        }
        out(ty * N + tx) = acc / (sx * sy)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Cosine basis for the 8 lowest frequencies of the 32-point DCT-II,
    * precomputed once (row u, sample i). */
  private val cosTable: Array[Array[Double]] = Array.tabulate(8, N) { (u, i) =>
    math.cos((2 * i + 1) * u * math.Pi / (2.0 * N))
  }

  /** Zigzag order of the 8×8 block, DC first — the JPEG coefficient
    * scan, so "first 60 AC" means the 60 LOWEST frequencies. */
  private val zigzag: Array[Int] = {
    val order = for {
      s <- 0 until 15
      u <- 0 to math.min(s, 7)
      v = s - u if v <= 7
    } yield if (s % 2 == 0) v * 8 + (s - v) else u * 8 + (s - u)
    order.toArray
  }

  /** 60-bit DCT perceptual hash of a decoded raster; bit k of the
    * result corresponds to the k-th AC coefficient in zigzag order,
    * set when the coefficient exceeds the median of the 60. Undecodable
    * payloads hash via the byte signature instead (caller's choice) —
    * this function is total over decoded images only. */
  def pHash60(img: Gray): Long = {
    val small = resampleToN(img)
    // separable 2D DCT-II, low 8×8 block only: rows then columns
    val rows = Array.ofDim[Double](N, 8) // rows(y)(u)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var i = 0
        while (i < N) { acc += small(y * N + i) * cosTable(u)(i); i += 1 }
        rows(y)(u) = acc
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64) // coef(v*8+u)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var j = 0
        while (j < N) { acc += rows(j)(u) * cosTable(v)(j); j += 1 }
        coef(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val ac = new Array[Double](60)
    var k = 0
    while (k < 60) { ac(k) = coef(zigzag(k + 1)); k += 1 } // skip DC
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val median = (sorted(29) + sorted(30)) / 2.0
    var out = 0L
    k = 0
    while (k < 60) { if (ac(k) > median) out |= (1L << k); k += 1 }
    out
  }

  /** Decode-or-fallback signature: decoded images get the pixel pHash,
    * undecodable payloads fall back to the byte-block SimHash (same
    * 60-bit width, so one banded join serves a mixed corpus — the
    * production shape where a crawl yields both real images and junk
    * bytes). */
  def signature60(bytes: Array[Byte]): Long = decode(bytes) match {
    case Some(img) => pHash60(img)
    case None => byteSimHash60(bytes)
  }

  /** The codec-free byte-block SimHash, shared with
    * [[MultimodalPipeline.perceptualHash60]] (kept in sync there). */
  private[streaming] def byteSimHash60(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val bits = graft.operators.Dedup.simHashBits
    val votes = new Array[Int](bits)
    val n = math.max(bytes.length - 3, 1)
    var i = 0
    while (i < n) {
      val h = graft.functions.Md5Hash.h1Bytes(bytes, i, math.min(4, bytes.length - i))
      var bit = 0
      while (bit < bits) {
        if (((h >>> bit) & 1L) != 0L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < bits) { if (votes(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }
}
