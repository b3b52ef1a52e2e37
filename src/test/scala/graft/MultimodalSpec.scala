package graft

import graft.functions.Md5Hash
import graft.streaming.ImageCodec
import org.scalatest.funsuite.AnyFunSuite

/** Hash-level facts behind the `mm_phash_pixels` structural oracle:
  * the SQL oracle pins the pair STRUCTURE (complete graph per copy
  * set); this spec pins WHY that structure is forced — codec
  * round-trip exactness, DCT-linearity invariances, the noise hamming
  * bound that guarantees banded-LSH recall, and distinct-image
  * separation.
  */
class MultimodalSpec extends AnyFunSuite {

  private def baseRgb(did: Long)(x: Int, y: Int): Int = {
    val v = (Md5Hash.h1(s"img:$did:${x / 4}:${y / 4}") % 200 + 20).toInt
    (v << 16) | (v << 8) | v
  }

  private def brightRgb(did: Long)(x: Int, y: Int): Int = {
    val v = (Md5Hash.h1(s"img:$did:${x / 4}:${y / 4}") % 200 + 20).toInt + 8
    (v << 16) | (v << 8) | v
  }

  private def noisePixels(did: Long): Array[Array[Int]] = {
    val px = Array.tabulate(32, 32) { (y, x) =>
      (Md5Hash.h1(s"img:$did:${x / 4}:${y / 4}") % 200 + 20).toInt
    }
    for (k <- 0 until 6) {
      val x = (Md5Hash.h1(s"nx:$did:$k") % 32).toInt
      val y = (Md5Hash.h1(s"ny:$did:$k") % 32).toInt
      val dl = if (Md5Hash.h1(s"nd:$did:$k") % 2 == 0) 2 else -2
      px(y)(x) = math.min(255, math.max(0, px(y)(x) + dl))
    }
    px
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("BMP and PPM of the same raster decode to identical pixels") {
    for (did <- Seq(0L, 17L, 391L, 4242L)) {
      val bmp = ImageCodec.decode(ImageCodec.encodeBmp(32, 32, baseRgb(did))).get
      val ppm = ImageCodec.decode(ImageCodec.encodePpm(32, 32, baseRgb(did))).get
      assert(bmp.width == 32 && bmp.height == 32)
      assert(ppm.width == 32 && ppm.height == 32)
      assert(bmp.pixels.sameElements(ppm.pixels))
    }
    // non-square raster exercises the area-average resample path
    val wide = ImageCodec.decode(ImageCodec.encodeBmp(48, 20, baseRgb(7L))).get
    assert(wide.width == 48 && wide.height == 20)
  }

  test("pHash: re-encode (format change) and uniform brightness are exact invariants") {
    for (did <- Seq(0L, 17L, 29L, 391L, 12345L)) {
      val hBmp = ImageCodec.pHash60(
        ImageCodec.decode(ImageCodec.encodeBmp(32, 32, baseRgb(did))).get)
      val hPpm = ImageCodec.pHash60(
        ImageCodec.decode(ImageCodec.encodePpm(32, 32, baseRgb(did))).get)
      val hBright = ImageCodec.pHash60(
        ImageCodec.decode(ImageCodec.encodeBmp(32, 32, brightRgb(did))).get)
      assert(hBmp == hPpm, s"re-encode changed the hash for doc $did")
      // +8 everywhere shifts only the DC coefficient; every AC
      // coefficient (and the median they are thresholded against) is
      // untouched — DCT linearity, the provable half of the oracle.
      assert(hBmp == hBright, s"brightness shift changed the hash for doc $did")
    }
  }

  test("pHash: noise copies stay within hamming <= bands - 1; distinct images separate") {
    val ids = (0L until 500L).filter(_ % 23 == 0)
    for (did <- ids) {
      val base = ImageCodec.pHash60(
        ImageCodec.decode(ImageCodec.encodeBmp(32, 32, baseRgb(did))).get)
      val px = noisePixels(did)
      val noisy = ImageCodec.pHash60(
        ImageCodec.decode(ImageCodec.encodeBmp(32, 32,
          (x, y) => (px(y)(x) << 16) | (px(y)(x) << 8) | px(y)(x))).get)
      // <= 3 = bands - 1 guarantees a shared 15-bit band (pigeonhole),
      // so banded LSH cannot miss the pair — recall is structural, not
      // probabilistic, which is what lets the oracle be exact.
      assert(hamming(base, noisy) <= 3,
        s"noise copy of doc $did drifted to hamming ${hamming(base, noisy)}")
    }
    val sigs = (0L until 50L).map(did => ImageCodec.pHash60(
      ImageCodec.decode(ImageCodec.encodeBmp(32, 32, baseRgb(did))).get))
    for (i <- sigs.indices; j <- (i + 1) until sigs.length)
      assert(hamming(sigs(i), sigs(j)) > 10,
        s"distinct images $i/$j at hamming ${hamming(sigs(i), sigs(j))}")
  }

  test("byte signature is byte-faithful: invalid-UTF-8 payloads no longer alias") {
    // Both payloads decode to 100 U+FFFD under a lossy UTF-8 round-trip
    // (the round-8 defect: new String(bytes, UTF_8) collapsed them to
    // the same signature). Byte-block hashing must tell them apart.
    val a = Array.fill[Byte](100)(0xFF.toByte)
    val b = Array.fill[Byte](100)(0xFE.toByte)
    assert(ImageCodec.signature60(a) != ImageCodec.signature60(b))
    // and ASCII payloads still hash like their string form: the
    // md5(substr(text, i, 4)) oracle replay stays exact.
    val text = "the quick brown fox jumps over the lazy dog"
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    assert(Md5Hash.h1Bytes(bytes, 0, 4) == Md5Hash.h1(text.substring(0, 4)))
    assert(Md5Hash.h1Bytes(bytes, 10, 4) == Md5Hash.h1(text.substring(10, 14)))
  }

  test("undecodable payloads fall back to the byte signature; truncated images rejected") {
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    assert(ImageCodec.decode(junk).isEmpty)
    val bmp = ImageCodec.encodeBmp(32, 32, baseRgb(1L))
    assert(ImageCodec.decode(java.util.Arrays.copyOf(bmp, 100)).isEmpty)
    val ppm = ImageCodec.encodePpm(32, 32, baseRgb(1L))
    assert(ImageCodec.decode(java.util.Arrays.copyOf(ppm, 50)).isEmpty)
  }

  test("hostile headers (int-overflow sizes, negative offsets) reject, never crash") {
    import graft.streaming.{AudioCodec, MultimodalPipeline, VideoCodec}
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // BMP with h = 2^28: rowBytes*h overflows int past the bound check
    val bmp = ImageCodec.encodeBmp(4, 4, (_, _) => 0x808080)
    System.arraycopy(le32(1 << 28), 0, bmp, 22, 4)
    assert(ImageCodec.decode(bmp).isEmpty)
    // BMP with a negative pixel-data offset
    val bmp2 = ImageCodec.encodeBmp(4, 4, (_, _) => 0x808080)
    System.arraycopy(le32(-100), 0, bmp2, 10, 4)
    assert(ImageCodec.decode(bmp2).isEmpty)
    // PPM with w*h*3 overflowing int
    val ppm = s"P6\n70000 70000\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](64)(1)
    assert(ImageCodec.decode(ppm).isEmpty)
    // WAV whose chunk size near Int.MaxValue wraps the int bound sum
    val wav = AudioCodec.encodeWav(Array.fill[Short](64)(100), 8000)
    System.arraycopy(le32(Int.MaxValue - 4), 0, wav, 40, 4) // data chunk size
    assert(AudioCodec.decodeWav(wav).isEmpty)
    // AVI with hostile frame width: rowBytes*h overflows int
    val avi = VideoCodec.encodeAvi(4, 4,
      IndexedSeq.fill(2)((_: Int, _: Int) => 0x808080))
    val strf = { // find the strf chunk and poison its width field
      var i = 12; var found = -1
      while (found < 0 && i + 8 < avi.length) {
        if (new String(avi, i, 4, "US-ASCII") == "strf") found = i + 8
        i += 1
      }
      found
    }
    assert(strf > 0)
    System.arraycopy(le32(0x40000000), 0, avi, strf + 4, 4)
    assert(VideoCodec.decodeAvi(avi).isEmpty)
    // all of them still sniff into their container block on byte fallback
    assert(MultimodalPipeline.sniffSignature(bmp)._2 === "img")
    assert(MultimodalPipeline.sniffSignature(wav)._2 === "aud")
    assert(MultimodalPipeline.sniffSignature(avi)._2 === "vid")
  }

  test("hostile dimensions that wrap even Long products reject, never crash") {
    import graft.streaming.VideoCodec
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // BMP with w = h = 2^31-1: rowBytes(Long)*h wraps NEGATIVE, so the
    // old dataOff+rowBytes*h bound passed and the decode read out of
    // bounds on a 54-byte file
    val bmp = ImageCodec.encodeBmp(4, 4, (_, _) => 0x808080)
    System.arraycopy(le32(Int.MaxValue), 0, bmp, 18, 4)
    System.arraycopy(le32(Int.MaxValue), 0, bmp, 22, 4)
    assert(ImageCodec.decode(java.util.Arrays.copyOf(bmp, 54)).isEmpty)
    assert(ImageCodec.decode(bmp).isEmpty)
    // PPM with w = h = 2^31-1: pos + w*h*3 wraps Long, the old decode
    // returned a corrupt Gray(2147483647, 2147483647, 1-element pixels)
    val ppm = s"P6\n2147483647 2147483647\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](64)(1)
    assert(ImageCodec.decode(ppm).isEmpty)
    // PPM with an 11-digit width: v = v*10 + digit silently wraps Int
    // into a plausible small dimension → silently-wrong raster
    val ppm2 = s"P6\n42949672970 4\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](64)(1)
    assert(ImageCodec.decode(ppm2).isEmpty)
    // AVI whose strf carries w = h = 2^31-1 (same Long-wrap shape)
    val avi = VideoCodec.encodeAvi(4, 4,
      IndexedSeq.fill(2)((_: Int, _: Int) => 0x808080))
    val strf = {
      var i = 12; var found = -1
      while (found < 0 && i + 8 < avi.length) {
        if (new String(avi, i, 4, "US-ASCII") == "strf") found = i + 8
        i += 1
      }
      found
    }
    assert(strf > 0)
    System.arraycopy(le32(Int.MaxValue), 0, avi, strf + 4, 4)
    System.arraycopy(le32(Int.MaxValue), 0, avi, strf + 8, 4)
    assert(VideoCodec.decodeAvi(avi).isEmpty)
  }

  test("deeply nested AVI grouping lists walk iteratively, no stack overflow") {
    import graft.streaming.VideoCodec
    def put32(out: Array[Byte], off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putTag(out: Array[Byte], off: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, 4)
    // ~3.6 MB of LIST('hdrl') nested 300k deep — 12 bytes per level; the
    // old recursive walk blew the thread stack on ~2.4 MB of this shape
    val depth = 300000
    val avi = new Array[Byte](12 + depth * 12)
    putTag(avi, 0, "RIFF"); put32(avi, 4, avi.length - 8); putTag(avi, 8, "AVI ")
    var off = 12
    var i = 0
    while (i < depth) {
      putTag(avi, off, "LIST")
      put32(avi, off + 4, 4 + (depth - 1 - i) * 12)
      putTag(avi, off + 8, "hdrl")
      off += 12; i += 1
    }
    assert(VideoCodec.decodeAvi(avi).isEmpty) // no strf/frames → None, no throw
  }

  test("mixed-corpus sniff routes each container to its codec; junk → byte block") {
    import graft.streaming.{AudioCodec, MultimodalPipeline, VideoCodec}
    val img = ImageCodec.encodeBmp(32, 32, baseRgb(2L))
    val ppm = ImageCodec.encodePpm(32, 32, baseRgb(2L))
    val wav = AudioCodec.encodeWav(Array.tabulate(2048)(i =>
      (math.sin(i * 0.1) * 8000).toShort), 8000)
    val avi = VideoCodec.encodeAvi(16, 16,
      graft.queries.RiskQueries.videoFrames(2L))
    assert(MultimodalPipeline.sniffSignature(img) ===
      (ImageCodec.signature60(img), "img"))
    assert(MultimodalPipeline.sniffSignature(ppm)._2 === "img")
    assert(MultimodalPipeline.sniffSignature(wav) ===
      (AudioCodec.signature60(wav), "aud"))
    assert(MultimodalPipeline.sniffSignature(avi) ===
      (VideoCodec.signature60(avi), "vid"))
    assert(MultimodalPipeline.sniffSignature("plain".getBytes)._2 === "bin")
    // a truncated WAV still lands in the "aud" block, on byte fallback
    val cut = java.util.Arrays.copyOf(wav, 16)
    assert(MultimodalPipeline.sniffSignature(cut)._2 === "aud")
    assert(AudioCodec.decodeWav(cut).isEmpty)
  }

  test("format blocking: identical signatures in different blocks never pair") {
    val spark = graft.core.GraftSession.local(4, "graft-test")
    import spark.implicits._
    val sigs = Seq((1L, 42L, "img"), (2L, 42L, "aud"), (3L, 42L, "img"))
      .toDF("__id", "simhash", "blk")
    val pairs = graft.operators.Dedup.bandedHammingPairs(
        sigs, maxHamming = 4, bands = 4, maxBucketSize = 100,
        blockCol = Some("blk"))
      .select("id_a", "id_b").as[(Long, Long)].collect.toSet
    assert(pairs === Set((1L, 3L))) // same block pairs; cross-block never
  }
}
