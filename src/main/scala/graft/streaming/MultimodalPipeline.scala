package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs partition-wise on executors (the Scala analog
  * of `mapInPandas` batching).
  *
  * The actual codec step is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake ([[FakeCodec]]); everything
  * Spark-side (schema, batching, partition-wise execution, feature
  * shape) is real and tested. Swap `FakeCodec.decode` for a real codec
  * (JNI/JavaCV) without touching the plan.
  */
object MultimodalPipeline {

  case class MediaFeature(doc_id: Long, n_bytes: Long, content_md5: String,
      fake_width: Int, fake_height: Int, fake_n_frames: Int)

  /** Deterministic stand-in for an image/video decoder. */
  object FakeCodec {
    /** Pretend to decode a payload: dimensions derived from content
      * length (a real decoder would parse the header here). */
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      ((n * 7) % 1024 + 1, (n * 13) % 768 + 1, n % 32 + 1)
    }
  }

  /** Partition-wise feature extraction over a binary payload column.
    * One codec instance per partition (the expensive-init pattern that
    * matters when the decode step is real).
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame,
      idCol: String, payloadCol: String): DataFrame = {
    val ds = docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
    ds.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        md.reset()
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        val (w, h, f) = FakeCodec.decode(bytes)
        MediaFeature(id, bytes.length.toLong, digest, w, h, f)
      }
    }(Encoders.product[MediaFeature]).toDF()
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, frame_ts_ms: Long,
      frame_bytes: Array[Byte], frame_width: Int, frame_height: Int)

  /** Frame sampling: each media payload explodes into ≤`maxFrames`
    * evenly-spaced frames. Real pipelines bound output size this way
    * before feature extraction; the per-frame payload here is the
    * deterministic fake a real decoder would replace. Partition-wise —
    * output scales with input × maxFrames, never collected.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
      idCol: String, payloadCol: String, maxFrames: Int): DataFrame = {
    val ds = docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, nFrames) = FakeCodec.decode(bytes)
        val take = math.min(maxFrames, nFrames)
        (0 until take).iterator.map { i =>
          // evenly spaced sample positions over the fake frame count
          val srcIdx = if (take == 1) 0 else i * (nFrames - 1) / (take - 1)
          val fb = Array.tabulate[Byte](8)(k =>
            bytes((srcIdx * 7 + k) % math.max(bytes.length, 1)))
          FrameRow(id, i, srcIdx * 40L, fb, w, h)
        }
      }
    }(Encoders.product[FrameRow]).toDF()
  }

  /** Resize plumbing: payload → payload with target dims recorded. The
    * byte transform is the stub; schema/partitioning are the contract.
    */
  def resize(spark: SparkSession, docs: DataFrame, idCol: String,
      payloadCol: String, targetW: Int, targetH: Int): DataFrame = {
    val ds = docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
    ds.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // stub "resample": stride-sampled bytes proportional to area ratio
        val outLen = math.max(1, math.min(bytes.length, targetW * targetH / 64))
        val out = Array.tabulate[Byte](outLen)(k =>
          bytes(k * math.max(bytes.length / outLen, 1) % math.max(bytes.length, 1)))
        (id, out, targetW, targetH, outLen.toLong)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.scalaInt,
      Encoders.scalaInt, Encoders.scalaLong))
      .toDF("doc_id", "payload", "width", "height", "n_bytes")
  }

  /** Perceptual-hash signature over a binary payload — the near-dup
    * companion to [[extractFeatures]]'s exact content hash (re-encoded
    * thumbnails and slightly-corrupted re-crawls never match an MD5).
    *
    * Codec-free form: SimHash over the payload's sliding 4-BYTE blocks,
    * hashed byte-faithfully ([[graft.functions.Md5Hash.h1Bytes]] — no
    * UTF-8 decode, so distinct binary payloads never alias through
    * U+FFFD replacement). For ASCII payloads the signature equals the
    * text SimHash oracle's `md5(substr(payload, i, 4))` replay. This is
    * the signature of choice when payloads are undecodable blobs; for
    * DECODED pixels use [[ImageCodec.pHash60]] (a real 32×32 DCT
    * perceptual hash — see [[phashPixelPairs]]), which survives
    * re-encoding across formats where this byte-level signature cannot.
    */
  private[graft] val perceptualHash60 = udf { bytes: Array[Byte] =>
    ImageCodec.byteSimHash60(bytes) // ONE implementation — also the
    // undecodable-payload fallback inside every codec's signature60
  }

  /** The shared shape of every 60-bit fingerprint pair family: signature
    * per payload (a per-row executor UDF — the codegen boundary), then
    * the banded hamming self-join over signatures only. */
  private def sigPairs(docs: DataFrame, idCol: String, payloadCol: String,
      sig: Array[Byte] => Long, maxHamming: Int, bands: Int,
      maxBucketSize: Int): DataFrame = {
    val sigU = udf { bytes: Array[Byte] => if (bytes == null) 0L else sig(bytes) }
    val sigs = graft.core.Tables.scatter(docs)
      .select(col(idCol).as("__id"),
        sigU(col(payloadCol).cast("binary")).as("simhash"))
      .persist()
    graft.operators.Dedup.bandedHammingPairs(sigs, maxHamming, bands, maxBucketSize)
  }

  /** Media near-dup pairs: perceptual signature → the same banded
    * hamming self-join the text SimHash path uses
    * ([[graft.operators.Dedup.bandedHammingPairs]]). Returns
    * (id_a, id_b, hamming), persisted.
    */
  def phashNearDupPairs(docs: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 4, maxBucketSize: Int = 1000): DataFrame =
    sigPairs(docs, idCol, payloadCol, ImageCodec.byteSimHash60,
      maxHamming, bands, maxBucketSize)

  /** PIXEL-level perceptual near-dup pairs: decode each payload
    * ([[ImageCodec.decode]] — BMP/PPM, the self-contained formats), DCT
    * pHash the raster ([[ImageCodec.pHash60]]), then the same banded
    * hamming self-join as every 60-bit signature family. Undecodable
    * payloads fall back to the byte-block SimHash inside
    * [[ImageCodec.signature60]], so a mixed corpus (real images + junk
    * bytes) flows through ONE join. This is what the byte signature
    * cannot do: the same raster re-encoded through a different format
    * (BMP ↔ PPM) or perturbed by per-pixel noise hashes to (nearly) the
    * same signature, because the hash is computed on decoded pixels
    * after a low-pass resize — while the encodings share almost no byte
    * blocks. Decode + hash are per-row executor work (codegen boundary
    * is the UDF, the join machinery stays whole-stage).
    */
  def phashPixelPairs(docs: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 4, maxBucketSize: Int = 1000): DataFrame =
    sigPairs(docs, idCol, payloadCol, ImageCodec.signature60,
      maxHamming, bands, maxBucketSize)

  /** SIGNAL-level audio near-dup pairs: decode each payload
    * ([[AudioCodec.decodeWav]] — RIFF/WAVE PCM, self-contained), take
    * the Haitsma–Kalker band-energy-sign fingerprint
    * ([[AudioCodec.fingerprint60]]), then the shared banded hamming
    * self-join. What the byte signature cannot do: the same samples in
    * a different chunk layout, or uniformly re-gained (×2^k exactly, by
    * IEEE homogeneity), fingerprint IDENTICALLY while sharing almost no
    * byte blocks; a corrupted first frame moves only LSH band 0's first
    * frame-pair bits, so `maxHamming ≥ 4` with ≥2 bands is pigeonhole-
    * guaranteed recall. Undecodable payloads fall back to the byte
    * SimHash, so mixed corpora ride ONE join. Decode + fingerprint are
    * per-row executor work; the join machinery stays whole-stage. */
  def audioFingerprintPairs(docs: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 4, maxBucketSize: Int = 1000): DataFrame =
    sigPairs(docs, idCol, payloadCol, AudioCodec.signature60,
      maxHamming, bands, maxBucketSize)

  /** FRAME-level video near-dup pairs: decode each payload
    * ([[VideoCodec.decodeAvi]] — RIFF/AVI uncompressed DIB,
    * self-contained), take the temporal region-luminance fingerprint
    * ([[VideoCodec.fingerprint60]]), then the shared banded hamming
    * self-join. What the byte signature cannot do: the same frames in a
    * different container layout (re-mux), or uniformly pixel-gained
    * (×2^k exactly, by IEEE homogeneity of the integer-luma sums),
    * fingerprint IDENTICALLY while sharing almost no byte blocks; a
    * corrupted first temporal group moves only LSH band 0's first
    * group-pair bits, so `maxHamming ≥ 4` with ≥2 bands is pigeonhole-
    * guaranteed recall. Undecodable payloads fall back to the byte
    * SimHash, so mixed corpora ride ONE join. Decode + fingerprint are
    * per-row executor work; the join machinery stays whole-stage. */
  def videoFingerprintPairs(docs: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 4, maxBucketSize: Int = 1000): DataFrame =
    sigPairs(docs, idCol, payloadCol, VideoCodec.signature60,
      maxHamming, bands, maxBucketSize)

  /** Container sniff + fingerprint dispatch for a MIXED media corpus:
    * BMP/PPM → pixel pHash, RIFF/WAVE → audio band-energy signs,
    * RIFF/AVI → video region-luma signs, anything else → the byte-block
    * SimHash. Returns (signature, formatBlock); the block is the
    * sniffed container, so a payload whose decode fails still competes
    * only inside its own container class (byte-level fallback there). */
  private[graft] def sniffSignature(bytes: Array[Byte]): (Long, String) = {
    def at(i: Int, s: String): Boolean =
      bytes.length >= i + s.length && s.indices.forall(k => bytes(i + k) == s(k).toByte)
    if (at(0, "BM") || at(0, "P6")) (ImageCodec.signature60(bytes), "img")
    else if (at(0, "RIFF") && at(8, "WAVE")) (AudioCodec.signature60(bytes), "aud")
    else if (at(0, "RIFF") && at(8, "AVI ")) (VideoCodec.signature60(bytes), "vid")
    else (ImageCodec.byteSimHash60(bytes), "bin")
  }

  /** Near-dup pairs over a MIXED media corpus — the production shape: a
    * real 100 TB media lake is not pre-separated by format. One pass
    * sniffs each payload's container and fingerprints it with the
    * matching codec; ONE banded hamming self-join finds pairs, with the
    * format as an LSH blocking key ([[graft.operators.Dedup]]'s
    * `blockCol`) so cross-format pairs — fingerprints from incomparable
    * spaces — are impossible by construction, not merely improbable.
    * Per-format invariants (re-encode, re-mux, gain) carry over
    * unchanged because each payload rides its own codec's fingerprint. */
  def mediaFingerprintPairs(docs: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 4, maxBucketSize: Int = 1000): DataFrame = {
    val sig = udf { bytes: Array[Byte] =>
      if (bytes == null) (0L, "bin") else sniffSignature(bytes)
    }
    val sigs = graft.core.Tables.scatter(docs)
      .select(col(idCol).as("__id"),
        sig(col(payloadCol).cast("binary")).as("__s"))
      .select(col("__id"), col("__s._1").as("simhash"), col("__s._2").as("blk"))
      .persist()
    graft.operators.Dedup.bandedHammingPairs(sigs, maxHamming, bands,
      maxBucketSize, blockCol = Some("blk"))
  }

}
