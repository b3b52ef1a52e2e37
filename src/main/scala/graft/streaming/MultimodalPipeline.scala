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
}
