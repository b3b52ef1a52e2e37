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
}
