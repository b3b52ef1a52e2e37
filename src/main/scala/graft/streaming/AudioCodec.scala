package graft.streaming

/** Self-contained RIFF/WAVE PCM codec + spectral audio fingerprint — the
  * audio twin of [[ImageCodec]]'s pixel path, so audio payloads get a
  * decoded-SIGNAL near-dup operator rather than only the byte-block
  * signature (reference analog: the tick/media payload columns the
  * pipelines carry opaquely, e.g. `tasks/pytdx/stock_tick.py` rides raw
  * vendor frames; here the engine decodes and fingerprints them).
  *
  * Codec: WAV PCM, 16-bit mono, little-endian — pure header math, no
  * libraries (this container ships none). The decoder walks RIFF chunks
  * generically and SKIPS unknown chunks, so the same samples wrapped in
  * a different chunk layout (e.g. an inserted LIST/INFO metadata chunk —
  * the "re-encoded by another tool" shape) decode identically.
  *
  * Fingerprint: the Haitsma–Kalker construction (ISMIR 2002, "A highly
  * robust audio fingerprint system" — public literature): split the
  * signal into 16 frames, measure per-frame energy in 5 frequency bands
  * (Goertzel, frame-relative bins 2/5/9/14/20), and take the SIGN of the
  * band-energy second difference
  * `(E[n+1][m] − E[n+1][m+1]) − (E[n][m] − E[n][m+1])` →
  * 15 frame-pairs × 4 band-diffs = 60 bits, riding the same banded
  * hamming machinery as every 60-bit signature family here.
  *
  * Why signs of differences: they are invariant under any uniform gain
  * g — energies scale by g² > 0, every difference scales by g², no sign
  * flips. For g an exact power of two the invariance is EXACT in IEEE
  * arithmetic (binary fp is homogeneous under power-of-2 scaling: every
  * intermediate of the linear Goertzel recursion scales by g with no
  * rounding drift), which is what AudioSpec pins. Bit locality gives the
  * LSH recall bound: frame j's energies feed only frame-pair bits j−1
  * and j, so corrupting ONLY the first frame (the "dropped leading
  * buffer" re-crawl defect) can move at most the 4 bits of frame-pair 0
  * — all inside LSH band 0 of 4 — leaving 3 bands intact: a banded join
  * with maxHamming ≥ 4 CANNOT miss such a pair (pigeonhole, not
  * probability).
  */
object AudioCodec {

  val frames = 16
  val bands = 5
  private val bins = Array(2, 5, 9, 14, 20)

  /** Encode 16-bit mono PCM as a WAV file. `extraChunk` inserts a
    * LIST/INFO metadata chunk between fmt and data — byte-different
    * container, identical samples (the re-encode variant). */
  def encodeWav(samples: Array[Short], sampleRate: Int,
      extraChunk: Boolean = false): Array[Byte] = {
    val info = ("INFOISFTgraft" + "\u0000").getBytes("US-ASCII")
    val extra = if (extraChunk) 8 + info.length else 0
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + extra + dataLen)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putTag(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, off, 4)
    }
    putTag(0, "RIFF"); put32(4, out.length - 8); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, 1) // mono
    put32(24, sampleRate)
    put32(28, sampleRate * 2)
    put16(32, 2)  // block align
    put16(34, 16) // bits/sample
    var off = 36
    if (extraChunk) {
      putTag(off, "LIST"); put32(off + 4, info.length)
      System.arraycopy(info, 0, out, off + 8, info.length)
      off += 8 + info.length
    }
    putTag(off, "data"); put32(off + 4, dataLen)
    var i = 0
    while (i < samples.length) {
      put16(off + 8 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a WAV: (sampleRate, samples) for PCM 16-bit mono; None for
    * anything else. Chunk walk skips unknown chunks (odd sizes padded
    * per RIFF), so metadata-bearing layouts decode to the same samples. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    def tag(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def i16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1
    var ok = false
    var data: Array[Short] = null
    while (off + 8 <= bytes.length && (data == null || !ok)) {
      val id = tag(off)
      val sz = i32(off + 4)
      // Long compare: a hostile sz near Int.MaxValue wraps the int sum
      // past the bound, allocating a ~2 GB data array below; malformed
      // payloads must return None (byte fallback), never blow the task.
      if (sz < 0 || off + 8L + sz > bytes.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          ok = i16(off + 8) == 1 && i16(off + 10) == 1 && i16(off + 22) == 16
          rate = i32(off + 12)
        case "data" =>
          val n = sz / 2
          data = new Array[Short](n)
          var i = 0
          while (i < n) { data(i) = i16(off + 8 + i * 2).toShort; i += 1 }
        case _ => () // skip LIST/fact/whatever
      }
      off += 8 + sz + (sz & 1) // RIFF pads odd chunks to even
    }
    if (ok && rate > 0 && data != null) Some((rate, data)) else None
  }

  /** Goertzel power of frame-relative bin k over samples [from, from+len). */
  private def goertzel(s: Array[Short], from: Int, len: Int, k: Int): Double = {
    val c = 2.0 * math.cos(2.0 * math.Pi * k / len)
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < len) {
      val s0 = s(from + i) + c * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - c * s1 * s2
  }

  /** 60-bit band-energy-sign fingerprint (see object doc). Signals
    * shorter than one sample per frame fingerprint to 0. */
  def fingerprint60(samples: Array[Short]): Long = {
    val flen = samples.length / frames
    if (flen == 0) return 0L
    val e = Array.ofDim[Double](frames, bands)
    var n = 0
    while (n < frames) {
      var m = 0
      while (m < bands) {
        e(n)(m) = goertzel(samples, n * flen, flen, bins(m))
        m += 1
      }
      n += 1
    }
    var out = 0L
    n = 0
    while (n < frames - 1) {
      var m = 0
      while (m < bands - 1) {
        val d2 = (e(n + 1)(m) - e(n + 1)(m + 1)) - (e(n)(m) - e(n)(m + 1))
        if (d2 > 0) out |= 1L << (n * 4 + m)
        m += 1
      }
      n += 1
    }
    out
  }

  /** Decode-or-fallback signature: decodable WAVs fingerprint on the
    * SIGNAL; junk payloads fall back to the byte-block SimHash so a
    * mixed corpus flows through one banded join ([[ImageCodec]] twin). */
  def signature60(bytes: Array[Byte]): Long = decodeWav(bytes) match {
    case Some((_, samples)) => fingerprint60(samples)
    case None => ImageCodec.byteSimHash60(bytes)
  }
}
