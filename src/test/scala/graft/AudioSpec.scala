package graft

import graft.functions.Md5Hash
import graft.streaming.AudioCodec
import org.scalatest.funsuite.AnyFunSuite

/** Fingerprint-level facts behind the `mm_audio_fp_pairs` structural
  * oracle: the SQL oracle pins the pair STRUCTURE (complete graph per
  * copy set); this spec pins WHY that structure is forced — WAV codec
  * round-trip exactness (including the chunk-skip path), the EXACT
  * gain-×2 invariance (IEEE power-of-2 homogeneity of the Goertzel
  * recursion), the first-frame-dropout bit-locality bound that
  * guarantees banded-LSH recall by pigeonhole, and distinct-signal
  * separation.
  */
class AudioSpec extends AnyFunSuite {

  /** The mm_audio_fp_pairs fixture signal — shared, not duplicated. */
  private def synth(did: Long): Array[Short] = graft.queries.RiskQueries.audioSynth(did)

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("WAV round-trip is exact; chunk-layout variant decodes to identical samples") {
    for (did <- Seq(0L, 17L, 391L, 4242L)) {
      val s = synth(did)
      val (rate, back) = AudioCodec.decodeWav(AudioCodec.encodeWav(s, 8000)).get
      assert(rate == 8000)
      assert(back.sameElements(s))
      val (_, backChunked) =
        AudioCodec.decodeWav(AudioCodec.encodeWav(s, 8000, extraChunk = true)).get
      assert(backChunked.sameElements(s))
    }
    // odd-length sample arrays exercise the RIFF even-padding math
    val odd = synth(7L).take(2047)
    assert(AudioCodec.decodeWav(AudioCodec.encodeWav(odd, 8000)).get._2.sameElements(odd))
  }

  test("fingerprint: re-encode (chunk layout) and gain x2 are exact invariants") {
    for (did <- Seq(0L, 17L, 23L, 391L, 12345L)) {
      val s = synth(did)
      val base = AudioCodec.signature60(AudioCodec.encodeWav(s, 8000))
      val chunked = AudioCodec.signature60(AudioCodec.encodeWav(s, 8000, extraChunk = true))
      assert(base == chunked, s"chunk-layout re-encode changed the fingerprint for doc $did")
      // x2 gain: every Goertzel intermediate scales by exactly 2 (binary
      // fp homogeneity), energies by exactly 4, no sign can flip.
      val gained = AudioCodec.signature60(
        AudioCodec.encodeWav(s.map(v => (v * 2).toShort), 8000))
      assert(base == gained, s"gain x2 changed the fingerprint for doc $did")
      // any power of two works while the scaled signal stays inside
      // int16 (the fixture synthesizes |sample| <= 15000, so x2 is the
      // clip-free headroom; x4 would wrap Short and is NOT claimed) —
      // pin x4 on a half-gain signal to show the exponent, not the
      // factor, is what matters.
      val half = s.map(v => (v / 2).toShort)
      val hBase = AudioCodec.fingerprint60(half)
      val h4 = AudioCodec.fingerprint60(half.map(v => (v * 4).toShort))
      assert(hBase == h4, s"gain x4 on half-gain signal changed the fingerprint for doc $did")
    }
  }

  test("fingerprint: first-frame dropout moves <= 4 bits, all inside LSH band 0") {
    for (did <- Seq(0L, 29L, 58L, 391L, 12345L)) {
      val s = synth(did)
      val dropped = s.clone()
      java.util.Arrays.fill(dropped, 0, 128, 0.toShort)
      val base = AudioCodec.fingerprint60(s)
      val drop = AudioCodec.fingerprint60(dropped)
      val diff = base ^ drop
      assert(java.lang.Long.bitCount(diff) <= 4,
        s"dropout moved ${java.lang.Long.bitCount(diff)} bits for doc $did")
      // frame 0 feeds only frame-pair 0 = bit positions 0..3 (band 0 of
      // the 4x15 banding) — bands 1..3 MUST be untouched.
      assert((diff & ~0xFL) == 0L,
        s"dropout leaked outside frame-pair 0's bits for doc $did: ${diff.toBinaryString}")
    }
  }

  test("distinct signals separate; junk payloads fall back to the byte signature") {
    val ids = (0L until 60L)
    val sigs = ids.map(did => AudioCodec.fingerprint60(synth(did)))
    for (i <- sigs.indices; j <- sigs.indices if i < j)
      assert(hamming(sigs(i), sigs(j)) > 4,
        s"distinct signals $i/$j at hamming ${hamming(sigs(i), sigs(j))}")
    // undecodable payloads take the byte-SimHash path, not an exception
    val junk = "not a wav at all, just bytes".getBytes("UTF-8")
    assert(AudioCodec.decodeWav(junk).isEmpty)
    assert(AudioCodec.signature60(junk) != 0L)
    // truncated WAV (header claims more data than present) is rejected
    val wav = AudioCodec.encodeWav(synth(3L), 8000)
    assert(AudioCodec.decodeWav(wav.take(100)).isEmpty)
  }
}
