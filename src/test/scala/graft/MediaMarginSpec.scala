package graft

import org.scalatest.funsuite.AnyFunSuite

/** Analytic margin for the mm_* / stream_media_neardup pair oracles.
  *
  * Those oracles assert the PLANTED pair structure and rely on "distinct
  * docs never qualify in the banded join" — previously verified only
  * empirically per SF, so a new SF or fixture tweak could surface a
  * coincidental collision and flap the board with no engine defect.
  * This spec pins the precondition ANALYTICALLY over the full sf0.1 id
  * range (0..4999, a superset of the 0..499 sf0.001/sf0.01 ranges, so
  * one sweep covers every test SF): for every cross-doc signature pair
  * (bases AND the signature-changing variants — pixel noise, first-
  * frame/sample dropout; re-encode and gain variants are bit-identical
  * to their base by the codec invariants, so they add no new
  * signatures), NO pair both shares a 15-bit LSH band and passes the
  * query's hamming filter — the exact qualifying condition of
  * [[graft.operators.Dedup.bandedHammingPairs]].
  *
  * Measured cross-doc minima over the base signatures (2026-08-15,
  * ids 0..4999): image pHash 10, audio fingerprint 8, video
  * fingerprint 6 — against query filters of 10 / 4 / 4. The image
  * minimum EQUALS its filter, which is why the band-share conjunct is
  * part of the pinned condition rather than a plain distance margin.
  */
class MediaMarginSpec extends AnyFunSuite {

  private val bands = 4
  private val bandBits = 15
  private val mask = (1L << bandBits) - 1

  private def sharesBand(a: Long, b: Long): Boolean = {
    var k = 0
    while (k < bands) {
      if (((a >>> (k * bandBits)) & mask) == ((b >>> (k * bandBits)) & mask))
        return true
      k += 1
    }
    false
  }

  /** (sourceDoc, signature) pairs: no cross-doc pair may share a band
    * AND sit within maxHamming. Returns the min cross-doc hamming for
    * the record. */
  private def assertNoQualifyingCrossPair(
      sigs: Array[(Long, Long)], maxHamming: Int, label: String): Int = {
    var minH = 64
    var i = 0
    while (i < sigs.length) {
      var j = i + 1
      while (j < sigs.length) {
        if (sigs(i)._1 != sigs(j)._1) {
          val h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
          if (h < minH) minH = h
          assert(h > maxHamming || !sharesBand(sigs(i)._2, sigs(j)._2),
            s"$label: docs ${sigs(i)._1} and ${sigs(j)._1} would qualify " +
              s"(hamming $h ≤ $maxHamming and a shared band) — fixture drift")
        }
        j += 1
      }
      i += 1
    }
    minH
  }

  private val n = 5000 // sf0.1 doc_id range; sf0.001/sf0.01 are 0..499

  test("image pHash: no cross-doc pair qualifies at maxHamming=10 (incl. noise variants)") {
    import graft.streaming.ImageCodec
    val base = Array.tabulate(n)(i => (i.toLong, ImageCodec.signature60(
      ImageCodec.encodeBmp(32, 32, graft.queries.RiskQueries.mixedRaster(i.toLong)))))
    // the %23 noise variant perturbs 6 hash-chosen pixels ±2 — the one
    // image variant whose signature differs from its base
    val noise = (0 until n by 23).map { i =>
      val did = i.toLong
      val px = Array.tabulate(32, 32) { (y, x) =>
        (graft.functions.Md5Hash.h1(s"img:$did:${x / 4}:${y / 4}") % 200 + 20).toInt
      }
      for (k <- 0 until 6) {
        val x = (graft.functions.Md5Hash.h1(s"nx:$did:$k") % 32).toInt
        val y = (graft.functions.Md5Hash.h1(s"ny:$did:$k") % 32).toInt
        val dl = if (graft.functions.Md5Hash.h1(s"nd:$did:$k") % 2 == 0) 2 else -2
        px(y)(x) = math.min(255, math.max(0, px(y)(x) + dl))
      }
      (did, ImageCodec.signature60(ImageCodec.encodeBmp(32, 32, (x, y) =>
        (px(y)(x) << 16) | (px(y)(x) << 8) | px(y)(x))))
    }
    val minH = assertNoQualifyingCrossPair(base ++ noise, maxHamming = 10, "img")
    assert(minH > 4, s"img cross-doc minimum collapsed to $minH — fixture drift")
  }

  test("audio fingerprint: no cross-doc pair qualifies at maxHamming=4 (incl. dropout)") {
    import graft.streaming.AudioCodec
    val base = Array.tabulate(n)(i => (i.toLong, AudioCodec.signature60(
      AudioCodec.encodeWav(graft.queries.RiskQueries.audioSynth(i.toLong), 8000))))
    val drop = (0 until n by 29).map { i =>
      val sm = graft.queries.RiskQueries.audioSynth(i.toLong)
      java.util.Arrays.fill(sm, 0, 128, 0.toShort)
      (i.toLong, AudioCodec.signature60(AudioCodec.encodeWav(sm, 8000)))
    }
    val minH = assertNoQualifyingCrossPair(base ++ drop, maxHamming = 4, "aud")
    assert(minH > 4, s"aud cross-doc minimum collapsed to $minH — fixture drift")
  }

  test("video fingerprint: no cross-doc pair qualifies at maxHamming=4 (incl. dropout)") {
    import graft.streaming.VideoCodec
    val base = Array.tabulate(n)(i => (i.toLong, VideoCodec.signature60(
      VideoCodec.encodeAvi(16, 16, graft.queries.RiskQueries.videoFrames(i.toLong)))))
    val drop = (0 until n by 29).map(i => (i.toLong, VideoCodec.signature60(
      VideoCodec.encodeAvi(16, 16,
        graft.queries.RiskQueries.videoFrames(i.toLong, dropFirst = true)))))
    val minH = assertNoQualifyingCrossPair(base ++ drop, maxHamming = 4, "vid")
    assert(minH > 4, s"vid cross-doc minimum collapsed to $minH — fixture drift")
  }
}
