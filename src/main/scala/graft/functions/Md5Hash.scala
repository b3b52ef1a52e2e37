package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Cross-engine-reproducible string hashes derived from MD5.
  *
  * The dedup/LSH kernels need hashes the DuckDB correctness oracle can
  * recompute exactly. xxhash64/murmur have no DuckDB twin, but `md5()`
  * does, so the shared base hashes are hex windows of the MD5 digest:
  *
  *  - `h1(s)` = first 15 hex chars as a long (60 bits) —
  *    DuckDB `('0x' || substr(md5(s), 1, 15))::BIGINT`
  *  - `h2(s)` = next 14 hex chars as a long (56 bits) —
  *    DuckDB `('0x' || substr(md5(s), 16, 14))::BIGINT`
  *
  * Both are non-negative and below 2^61 — in particular h1 < the
  * Mersenne prime 2^61−1, so it can feed the universal-hash MinHash
  * permutations `(a_k·h1 + b_k) mod (2^61−1)` directly (see
  * graft.operators.Dedup.minHashSignature for why the earlier
  * Kirsch–Mitzenmacher `h1 + i·h2` family was retired: its components
  * are argmin-correlated across i, which broke banding).
  * Parsed straight from digest bytes — no hex-string allocation in the
  * hot loop.
  */
object Md5Hash {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** (h1, h2) of the string's MD5 — see class doc for the bit layout. */
  def h1h2(s: String): (Long, Long) = {
    val d = md.get().digest(s.getBytes(StandardCharsets.UTF_8))
    // hex chars 1..15 = bytes 0..6 + high nibble of byte 7
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    h1 = (h1 << 4) | ((d(7) & 0xf0L) >> 4)
    // hex chars 16..29 = low nibble of byte 7, bytes 8..13, high nibble of byte 14
    var h2 = d(7) & 0x0fL
    i = 8
    while (i < 14) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    h2 = (h2 << 4) | ((d(14) & 0xf0L) >> 4)
    (h1, h2)
  }

  def h1(s: String): Long = h1h2(s)._1

  /** h1 over a RAW byte window — the byte-faithful twin of [[h1]] for
    * kernels hashing binary payloads (perceptual signatures over media
    * bytes). For ASCII content `h1Bytes(s.getBytes, …)` equals
    * `h1(s.substring(…))` (same octets into MD5), so text-payload
    * oracles replaying `md5(substr(…))` stay exact; for arbitrary
    * binary it hashes the actual octets instead of a lossy UTF-8
    * decode (invalid sequences would collapse to U+FFFD and alias
    * distinct payloads). */
  def h1Bytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    val m = md.get()
    m.reset()
    m.update(bytes, off, len)
    val d = m.digest()
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    (h1 << 4) | ((d(7) & 0xf0L) >> 4)
  }

  private val cache = new ThreadLocal[java.util.HashMap[String, (Long, Long)]] {
    override def initialValue() = new java.util.HashMap[String, (Long, Long)](1 << 16)
  }
  private val CacheCap = 1 << 20

  /** Memoized [[h1h2]] for hot kernels hashing highly repetitive keys
    * (char shingles recur across documents): one MD5 per distinct string
    * per thread. Cache is thread-local (no contention) and capped.
    */
  def h1h2Cached(s: String): (Long, Long) = {
    val c = cache.get()
    val hit = c.get(s)
    if (hit != null) hit
    else {
      val v = h1h2(s)
      if (c.size < CacheCap) c.put(s, v)
      v
    }
  }
}
