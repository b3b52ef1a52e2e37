package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate flagging — the LSH twin of the exact
  * streaming dedup (`dropDuplicatesWithinWatermark` catches only
  * byte-identical re-deliveries; a re-crawled page with a tweaked
  * footer sails through). Each incoming document's 60-bit SimHash is
  * banded exactly like the batch path
  * ([[graft.operators.Dedup.simHashDupPairs]]); per band-bucket,
  * `flatMapGroupsWithState` keeps the documents seen in EARLIER
  * micro-batches and emits a verified (new, prior, hamming) hit row for
  * every close prior — the batch-vs-corpus shape of the incremental
  * dedup index, continuously maintained.
  *
  * Semantics pinned for determinism: a document is compared against
  * priors from STRICTLY earlier micro-batches only (same-batch pairs
  * are the batch path's job), so the output is independent of
  * intra-batch row order; the per-bucket state cap keeps the lowest
  * `maxBucket` doc ids (a deterministic rule, not arrival order).
  * State is `buckets × maxBucket` (id, sig) pairs — bounded regardless
  * of stream volume; at production scale the cap doubles as the
  * mega-bucket guard (signature 0 of empty payloads, boilerplate).
  * A pair that collides in several bands emits once per band — the
  * band column is part of the result, so no cross-group dedup state is
  * needed downstream.
  *
  * Identity collapse (the streaming twin of the batch pair joins'
  * [[graft.operators.Dedup]] `collapseByText` pre-pass): the hamming
  * distance depends ONLY on the two signatures, so members sharing a
  * signature are interchangeable for comparison. Both the stored state
  * and each batch are folded into signature GROUPS, the O(n²) hamming
  * loop runs over distinct-signature pairs, and the member cross
  * product is fanned out only for the qualifying pairs — which is the
  * mandated output, so the fan-out is O(emitted rows). On a
  * duplicate-dense corpus (k identical copies per doc — the shape the
  * sf1 scaling corpus replicates) this cuts the comparison count by k²
  * while emitting the identical hit set.
  */
object NearDupStream {
  case class BandRow(doc_id: Long, simhash: Long, band: Int, bk: Long)
  case class MediaBandRow(doc_id: Long, simhash: Long, blk: String, band: Int, bk: Long)
  case class Hit(doc_id: Long, prior_id: Long, band: Long, hamming: Long)
  case class BucketState(members: List[(Long, Long)])

  /** The shared per-bucket step: signature-group collapse, distinct-pair
    * hamming, member fan-out for qualifying pairs, deterministic
    * lowest-id state cap. Both the text and the media groupers run this
    * body — only their grouping keys differ. */
  private def bucketStep(band: Int, cur: List[(Long, Long)],
      st: GroupState[BucketState], maxHamming: Int, maxBucket: Int): Iterator[Hit] = {
    val prior = st.getOption.map(_.members).getOrElse(Nil)
    val priorBySig =
      prior.groupBy(_._2).iterator.map { case (s, m) => (s, m.map(_._1)) }.toArray
    val curBySig =
      cur.groupBy(_._2).iterator.map { case (s, m) => (s, m.map(_._1)) }.toArray
    val hits = for {
      (sig, ids) <- curBySig.iterator
      (psig, pids) <- priorBySig.iterator
      h = java.lang.Long.bitCount(sig ^ psig) if h <= maxHamming
      id <- ids.iterator
      pid <- pids.iterator
    } yield Hit(id, pid, band.toLong, h.toLong)
    st.update(BucketState((prior ++ cur).sortBy(_._1).take(maxBucket)))
    hits
  }

  def nearDupFlags(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, maxHamming: Int, bands: Int = 4,
      maxBucket: Int = 1000): Dataset[Hit] = {
    import spark.implicits._
    require(Dedup.simHashBits % bands == 0,
      s"bands=$bands must divide ${Dedup.simHashBits} signature bits")
    val bandBits = Dedup.simHashBits / bands
    val mask = (1L << bandBits) - 1
    val sigs = Dedup.simHash(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")), "__text")
    val banded = sigs.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("simhash"), b * bandBits).bitwiseAND(mask)): _*))
          .as(Seq("band", "bk")))
      .as[BandRow]
    banded.groupByKey(r => (r.band, r.bk))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow], st: GroupState[BucketState]) =>
          bucketStep(key._1, rows.map(r => (r.doc_id, r.simhash)).toList,
            st, maxHamming, maxBucket)
      }
  }

  /** Streaming near-dup over a MIXED media stream — the streaming twin
    * of [[MultimodalPipeline.mediaFingerprintPairs]]: each arriving
    * payload is container-sniffed and fingerprinted with its own codec
    * ([[MultimodalPipeline.sniffSignature]]), and the per-bucket state
    * is keyed by (format, band, bucket) so cross-format comparisons
    * never happen — the state-space analogue of the batch blockCol.
    * Same strictly-earlier-batch emission, same deterministic lowest-id
    * cap, same signature-group collapse as the text path. */
  def mediaNearDupFlags(spark: SparkSession, docs: DataFrame, idCol: String,
      payloadCol: String, maxHamming: Int, bands: Int = 4,
      maxBucket: Int = 1000): Dataset[Hit] = {
    import spark.implicits._
    require(Dedup.simHashBits % bands == 0,
      s"bands=$bands must divide ${Dedup.simHashBits} signature bits")
    val bandBits = Dedup.simHashBits / bands
    val mask = (1L << bandBits) - 1
    val sig = udf { bytes: Array[Byte] =>
      if (bytes == null) (0L, "bin") else MultimodalPipeline.sniffSignature(bytes)
    }
    val sigs = docs
      .select(col(idCol).as("doc_id"), sig(col(payloadCol).cast("binary")).as("__s"))
      .select(col("doc_id"), col("__s._1").as("simhash"), col("__s._2").as("blk"))
    val banded = sigs.select(col("doc_id"), col("simhash"), col("blk"),
        posexplode(array((0 until bands).map(b =>
          shiftrightunsigned(col("simhash"), b * bandBits).bitwiseAND(mask)): _*))
          .as(Seq("band", "bk")))
      .as[MediaBandRow]
    banded.groupByKey(r => (r.blk, r.band, r.bk))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (String, Int, Long), rows: Iterator[MediaBandRow],
            st: GroupState[BucketState]) =>
          bucketStep(key._2, rows.map(r => (r.doc_id, r.simhash)).toList,
            st, maxHamming, maxBucket)
      }
  }
}
