package graft

import graft.streaming.VideoCodec
import org.scalatest.funsuite.AnyFunSuite

/** Fingerprint-level facts behind the `mm_video_fp_pairs` structural
  * oracle: the SQL oracle pins the pair STRUCTURE (complete graph per
  * copy set); this spec pins WHY that structure is forced — AVI codec
  * round-trip exactness (including the metadata-list skip), the EXACT
  * pixel-gain-×2 invariance (IEEE power-of-2 homogeneity of the
  * integer-luma region sums), the first-frame-dropout bit-locality
  * bound that guarantees banded-LSH recall by pigeonhole, and
  * distinct-video separation.
  */
class VideoSpec extends AnyFunSuite {

  /** The mm_video_fp_pairs fixture frames — shared, not duplicated. */
  private def frames(did: Long, gain: Int = 1, dropFirst: Boolean = false) =
    graft.queries.RiskQueries.videoFrames(did, gain, dropFirst)

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("AVI round-trip is exact; metadata-list variant decodes to identical frames") {
    for (did <- Seq(0L, 17L, 391L, 4242L)) {
      val fs = frames(did)
      val base = VideoCodec.decodeAvi(VideoCodec.encodeAvi(16, 16, fs)).get
      assert(base.length == 16)
      // decoded luma must equal the synthesized intensity exactly:
      // gray(v,v,v) = v·(299+587+114)/1000 = v
      for (n <- 0 until 16; y <- 0 until 16; x <- 0 until 16)
        assert(base(n).pixels(y * 16 + x) == (fs(n)(x, y) & 0xff).toDouble)
      val muxed = VideoCodec.decodeAvi(
        VideoCodec.encodeAvi(16, 16, fs, extraChunk = true)).get
      for (n <- 0 until 16)
        assert(muxed(n).pixels.sameElements(base(n).pixels),
          s"re-mux changed frame $n of doc $did")
    }
    // odd width exercises the 4-byte DIB row padding math
    val odd = IndexedSeq.tabulate(16)(n => (x: Int, y: Int) => ((n + x + y) % 97) * 0x010101)
    val back = VideoCodec.decodeAvi(VideoCodec.encodeAvi(15, 9, odd)).get
    assert(back.length == 16 && back(0).width == 15 && back(0).height == 9)
    for (n <- 0 until 16; y <- 0 until 9; x <- 0 until 15)
      assert(back(n).pixels(y * 15 + x) == ((n + x + y) % 97).toDouble)
  }

  test("fingerprint: re-mux and pixel gain x2 are exact invariants") {
    for (did <- Seq(0L, 17L, 23L, 391L, 12345L)) {
      val base = VideoCodec.signature60(VideoCodec.encodeAvi(16, 16, frames(did)))
      val muxed = VideoCodec.signature60(
        VideoCodec.encodeAvi(16, 16, frames(did), extraChunk = true))
      assert(base == muxed, s"re-mux changed the fingerprint for doc $did")
      // x2 gain: every integer luma numerator and every region sum
      // scales by exactly 2 (binary fp homogeneity), every second
      // difference by exactly 2 — no sign can flip. Fixture intensities
      // are <= 119, so x2 stays inside the 255 clamp.
      val gained = VideoCodec.signature60(
        VideoCodec.encodeAvi(16, 16, frames(did, gain = 2)))
      assert(base == gained, s"pixel gain x2 changed the fingerprint for doc $did")
    }
  }

  test("fingerprint: first-frame dropout moves <= 4 bits, all inside LSH band 0") {
    for (did <- Seq(0L, 29L, 58L, 391L, 12345L)) {
      val base = VideoCodec.fingerprint60(
        VideoCodec.decodeAvi(VideoCodec.encodeAvi(16, 16, frames(did))).get)
      val drop = VideoCodec.fingerprint60(
        VideoCodec.decodeAvi(
          VideoCodec.encodeAvi(16, 16, frames(did, dropFirst = true))).get)
      val diff = base ^ drop
      assert(java.lang.Long.bitCount(diff) <= 4,
        s"dropout moved ${java.lang.Long.bitCount(diff)} bits for doc $did")
      // frame 0 = temporal group 0 feeds only group-pair 0 = bit
      // positions 0..3 (band 0 of the 4x15 banding) — bands 1..3 MUST
      // be untouched.
      assert((diff & ~0xFL) == 0L,
        s"dropout leaked outside group-pair 0's bits for doc $did: ${diff.toBinaryString}")
    }
  }

  test("distinct videos separate; junk payloads fall back to the byte signature") {
    val ids = (0L until 60L)
    val sigs = ids.map(did => VideoCodec.signature60(VideoCodec.encodeAvi(16, 16, frames(did))))
    for (i <- sigs.indices; j <- sigs.indices if i < j)
      assert(hamming(sigs(i), sigs(j)) > 4,
        s"distinct videos $i/$j at hamming ${hamming(sigs(i), sigs(j))}")
    // undecodable payloads take the byte-SimHash path, not an exception
    val junk = "definitely not an avi container".getBytes("UTF-8")
    assert(VideoCodec.decodeAvi(junk).isEmpty)
    assert(VideoCodec.signature60(junk) != 0L)
    // truncated AVI (header claims more data than present) is rejected
    val avi = VideoCodec.encodeAvi(16, 16, frames(3L))
    assert(VideoCodec.decodeAvi(avi.take(300)).isEmpty)
    // a WAV is RIFF but not AVI — rejected at the form-type check
    assert(VideoCodec.decodeAvi(
      graft.streaming.AudioCodec.encodeWav(Array[Short](1, 2, 3, 4), 8000)).isEmpty)
  }
}
