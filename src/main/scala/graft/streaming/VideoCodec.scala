package graft.streaming

import graft.streaming.ImageCodec.Gray

/** Self-contained AVI (RIFF) uncompressed-DIB video codec + temporal
  * fingerprint — the third leg of the multimodal triad next to
  * [[ImageCodec]] (pixels) and [[AudioCodec]] (signal), so video
  * payloads get a decoded-FRAMES near-dup operator rather than only the
  * byte-block signature (reference analog: the opaque media payload
  * columns its pipelines carry, e.g. `tasks/pytdx/stock_tick.py` rides
  * raw vendor frames; here the engine decodes and fingerprints them).
  *
  * Container: AVI — RIFF('AVI ') with LIST('hdrl'){avih,
  * LIST('strl'){strh,strf=BITMAPINFOHEADER}} and LIST('movi') holding
  * one '00db' chunk of raw bottom-up BGR-padded DIB rows per frame —
  * pure header math, no libraries. The decoder is a depth-first RIFF
  * walk over the standard grouping lists (hdrl/strl/movi/rec) that
  * picks up the first 'strf' and every '00db' wherever they sit and
  * SKIPS everything else — metadata lists wholesale — so the same
  * frames wrapped in a different chunk layout (an inserted LIST/INFO
  * chunk — the "re-muxed by another tool" shape) decode identically.
  *
  * Fingerprint: the Haitsma–Kalker sign-of-second-difference
  * construction ([[AudioCodec]]'s scheme) applied to spatial-region
  * luminance instead of spectral bands — the classic layout-energy
  * video signature shape (cf. MPEG-7 video signature tools, public
  * literature): split the frame sequence into 16 temporal groups,
  * measure summed BT.601 luma in 5 spatial regions (4 quadrants + the
  * overlapping center), and take the sign of
  * `(E[n+1][m] − E[n+1][m+1]) − (E[n][m] − E[n][m+1])` →
  * 15 group-pairs × 4 region-diffs = 60 bits on the shared banded
  * hamming machinery.
  *
  * Invariants (AudioSpec's proofs carry over verbatim): a uniform pixel
  * gain ×2^k scales every integer luma numerator and every energy sum
  * by exactly 2^k (IEEE power-of-2 homogeneity — no sign flips, EXACT
  * fingerprint equality while 2^k·v ≤ 255); re-muxing is exact because
  * the decoded rasters are byte-identical; and group j's energies feed
  * only group-pair bits j−1 and j, so corrupting ONLY the first
  * temporal group (the "dropped leading GOP" re-crawl defect) moves at
  * most group-pair 0's 4 bits — all inside LSH band 0 of 4 — leaving 3
  * bands intact: a banded join with maxHamming ≥ 4 CANNOT miss such a
  * pair (pigeonhole, not probability).
  */
object VideoCodec {

  val groups = 16
  val regions = 5

  private def put32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
    out(off + 2) = ((v >> 16) & 0xff).toByte
    out(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def put16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putTag(out: Array[Byte], off: Int, s: String): Unit =
    System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, 4)

  /** Encode frames (each an (x, y) → packed 0xRRGGBB function) as an
    * uncompressed 24-bit AVI. `extraChunk` inserts a LIST/INFO metadata
    * chunk between hdrl and movi — byte-different container, identical
    * frames (the re-mux variant). */
  def encodeAvi(w: Int, h: Int, frames: IndexedSeq[(Int, Int) => Int],
      fps: Int = 10, extraChunk: Boolean = false): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val frameBytes = rowBytes * h
    val info = "INFOISFTgraft ".getBytes("US-ASCII")
    val extra = if (extraChunk) 8 + info.length else 0
    // RIFF(12) + LIST hdrl(12 + avih 64 + LIST strl(12 + strh 64 + strf 48))
    val hdrlLen = 4 + 64 + (8 + 4 + 64 + 48)
    val moviLen = 4 + frames.length * (8 + frameBytes)
    val out = new Array[Byte](12 + 8 + hdrlLen + extra + 8 + moviLen)
    putTag(out, 0, "RIFF"); put32(out, 4, out.length - 8); putTag(out, 8, "AVI ")
    var off = 12
    putTag(out, off, "LIST"); put32(out, off + 4, hdrlLen); putTag(out, off + 8, "hdrl")
    off += 12
    putTag(out, off, "avih"); put32(out, off + 4, 56)
    put32(out, off + 8, 1000000 / fps)        // usec per frame
    put32(out, off + 8 + 16, frames.length)   // total frames
    put32(out, off + 8 + 24, 1)               // streams
    put32(out, off + 8 + 32, w)
    put32(out, off + 8 + 36, h)
    off += 8 + 56
    putTag(out, off, "LIST"); put32(out, off + 4, 4 + 64 + 48); putTag(out, off + 8, "strl")
    off += 12
    putTag(out, off, "strh"); put32(out, off + 4, 56)
    putTag(out, off + 8, "vids"); putTag(out, off + 12, "DIB ")
    put32(out, off + 8 + 20, 1)               // scale
    put32(out, off + 8 + 24, fps)             // rate
    put32(out, off + 8 + 32, frames.length)   // length
    off += 8 + 56
    putTag(out, off, "strf"); put32(out, off + 4, 40)
    put32(out, off + 8, 40)                   // biSize
    put32(out, off + 12, w)
    put32(out, off + 16, h)                   // bottom-up
    put16(out, off + 20, 1)                   // planes
    put16(out, off + 22, 24)                  // bpp
    put32(out, off + 24, 0)                   // BI_RGB
    put32(out, off + 28, frameBytes)
    off += 8 + 40
    if (extraChunk) {
      putTag(out, off, "LIST"); put32(out, off + 4, info.length)
      System.arraycopy(info, 0, out, off + 8, info.length)
      off += 8 + info.length
    }
    putTag(out, off, "LIST"); put32(out, off + 4, moviLen); putTag(out, off + 8, "movi")
    off += 12
    frames.foreach { f =>
      putTag(out, off, "00db"); put32(out, off + 4, frameBytes)
      var y = 0
      while (y < h) {
        val rowOff = off + 8 + (h - 1 - y) * rowBytes // bottom-up
        var x = 0
        while (x < w) {
          val rgb = f(x, y)
          out(rowOff + x * 3) = (rgb & 0xff).toByte
          out(rowOff + x * 3 + 1) = ((rgb >> 8) & 0xff).toByte
          out(rowOff + x * 3 + 2) = ((rgb >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      off += 8 + frameBytes
    }
    out
  }

  /** Decode an AVI: grayscale frames for 24-bit uncompressed DIB video;
    * None for anything else. A generic depth-first chunk walk collects
    * the first 'strf' (format) and every '00db' (frame) wherever the
    * mux put them, skipping unknown chunks (odd sizes padded per RIFF),
    * so metadata-bearing layouts decode to the same frames. */
  def decodeAvi(bytes: Array[Byte]): Option[Array[Gray]] = {
    if (bytes == null || bytes.length < 12) return None
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def i16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var strfOff = -1
    var strfSz = -1
    val frameChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var bad = false
    // Iterative chunk walk over an explicit (from, to) range stack — a
    // hostile payload of nested grouping lists (12 bytes per level)
    // would drive a recursive walk O(len/12) frames deep and blow the
    // executor's thread stack; the range stack lives on the heap and is
    // bounded by nesting depth. Depth-first document order is preserved
    // (so "first strf" means the same chunk) by pushing the current
    // range's continuation BELOW the child range.
    var stack: List[(Int, Int)] = (12, bytes.length) :: Nil
    while (!bad && stack.nonEmpty) {
      var (off, to) = stack.head
      stack = stack.tail
      var descended = false
      while (!bad && !descended && off + 8 <= to) {
        val id = tag(off)
        val sz = i32(off + 4)
        // Long compare — hostile sz wraps the int sum past the bound
        // (same hardening as the WAV/BMP guards).
        if (sz < 0 || off + 8L + sz > to) bad = true
        else {
          // descend only into the standard AVI grouping lists — metadata
          // lists (INFO etc.) are skipped wholesale, so their payloads
          // need not parse as chunks
          if (id == "LIST" && sz >= 4 &&
              (tag(off + 8) == "hdrl" || tag(off + 8) == "strl" ||
               tag(off + 8) == "movi" || tag(off + 8) == "rec ")) {
            stack = (off + 12, off + 8 + sz) ::
              (off + 8 + sz + (sz & 1), to) :: stack
            descended = true
          }
          else if (id == "strf" && strfOff < 0) { strfOff = off + 8; strfSz = sz }
          else if (id == "00db") frameChunks += ((off + 8, sz))
          if (!descended) off += 8 + sz + (sz & 1) // RIFF pads odd chunks to even
        }
      }
    }
    // strf must hold at least the 20 BITMAPINFOHEADER bytes we read —
    // a truncated header chunk would otherwise index past its bounds.
    if (bad || strfOff < 0 || strfSz < 20 || frameChunks.isEmpty) return None
    val w = i32(strfOff + 4)
    val h = i32(strfOff + 8)
    val bpp = i16(strfOff + 14)
    val compression = i32(strfOff + 16)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    // Frame pixels can never exceed payload bytes for uncompressed
    // 24-bit DIB (3 bytes/px), and this check stays exact even when w
    // and h are BOTH near 2^31 (where rowBytes*h wraps even a Long) —
    // reject absurd dimensions before forming any other product.
    if (w.toLong * h > bytes.length) return None
    // Long row stride: hostile w overflows the int product, slipping a
    // short frame chunk past the size check into out-of-bounds reads.
    val rowBytesL = (w.toLong * 3 + 3) & ~3L
    val frames = new Array[Gray](frameChunks.length)
    var n = 0
    while (n < frameChunks.length) {
      val (dataOff, sz) = frameChunks(n)
      if (sz < rowBytesL * h) return None
      val rowBytes = rowBytesL.toInt
      val px = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        val rowOff = dataOff + (h - 1 - y) * rowBytes // bottom-up
        var x = 0
        while (x < w) {
          val b = bytes(rowOff + x * 3) & 0xff
          val g = bytes(rowOff + x * 3 + 1) & 0xff
          val r = bytes(rowOff + x * 3 + 2) & 0xff
          px(y * w + x) = (r * 299 + g * 587 + b * 114) / 1000.0
          x += 1
        }
        y += 1
      }
      frames(n) = Gray(w, h, px)
      n += 1
    }
    Some(frames)
  }

  /** Summed luma of region r (0–3 the quadrants, 4 the overlapping
    * center) of one frame. */
  private def regionEnergy(f: Gray, r: Int): Double = {
    val (x0, x1, y0, y1) = r match {
      case 0 => (0, f.width / 2, 0, f.height / 2)
      case 1 => (f.width / 2, f.width, 0, f.height / 2)
      case 2 => (0, f.width / 2, f.height / 2, f.height)
      case 3 => (f.width / 2, f.width, f.height / 2, f.height)
      case _ => (f.width / 4, 3 * f.width / 4, f.height / 4, 3 * f.height / 4)
    }
    var s = 0.0
    var y = y0
    while (y < y1) {
      var x = x0
      while (x < x1) { s += f.pixels(y * f.width + x); x += 1 }
      y += 1
    }
    s
  }

  /** 60-bit region-luminance-sign fingerprint (see object doc).
    * Sequences shorter than one frame per temporal group fingerprint
    * to 0. */
  def fingerprint60(frames: Array[Gray]): Long = {
    val flen = frames.length / groups
    if (flen == 0) return 0L
    val e = Array.ofDim[Double](groups, regions)
    var n = 0
    while (n < groups) {
      var m = 0
      while (m < regions) {
        var s = 0.0
        var i = 0
        while (i < flen) { s += regionEnergy(frames(n * flen + i), m); i += 1 }
        e(n)(m) = s
        m += 1
      }
      n += 1
    }
    var out = 0L
    n = 0
    while (n < groups - 1) {
      var m = 0
      while (m < regions - 1) {
        val d2 = (e(n + 1)(m) - e(n + 1)(m + 1)) - (e(n)(m) - e(n)(m + 1))
        if (d2 > 0) out |= 1L << (n * 4 + m)
        m += 1
      }
      n += 1
    }
    out
  }

  /** Decode-or-fallback signature: decodable AVIs fingerprint on the
    * FRAMES; junk payloads fall back to the byte-block SimHash so a
    * mixed corpus flows through one banded join ([[AudioCodec]] twin). */
  def signature60(bytes: Array[Byte]): Long = decodeAvi(bytes) match {
    case Some(frames) => fingerprint60(frames)
    case None => ImageCodec.byteSimHash60(bytes)
  }
}
