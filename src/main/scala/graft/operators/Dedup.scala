package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Each variant is designed
  * around one shuffle on a compact key — the shape that holds at 100 TB:
  * hash/signature computation is a codegen'd map, clustering is a
  * groupBy on the signature (never an O(n²) cross join), and pair
  * verification only runs inside LSH candidate buckets.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id document per normalized-content
    * fingerprint. One shuffle on the 64-bit fingerprint. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.withColumn("__fp", TextFunctions.fingerprint64(col(textCol)))
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    fp.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Exact-dup groups: fingerprint → member count + kept id (for audit). */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)

  /** MinHash signature: `numHashes` permutations approximated by
    * xxhash64(seed_i, shingle); signature_i = min over shingles.
    * Pure column algebra — computed in the scan stage.
    */
  def minHashSignature(docs: DataFrame, textCol: String, shingleLen: Int,
      numHashes: Int): DataFrame = {
    val sh = TextFunctions.charShingles(col(textCol), shingleLen)
    val sig = array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i.toLong), s)))
    }: _*)
    docs.withColumn("minhash_sig", sig)
  }

  /** MinHash-LSH candidate pairs: band the signature, group by
    * (band, band-hash), emit intra-bucket pairs, then verify with exact
    * Jaccard over shingles. `bands × rows/band = numHashes`. The
    * explode is by-band (data ×bands, still linear); pairs only
    * materialize within buckets.
    */
  def minHashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 5, numHashes: Int = 16, bands: Int = 4,
      jaccardThreshold: Double = 0.6): DataFrame = {
    val rowsPerBand = numHashes / bands
    val signed = minHashSignature(docs, textCol, shingleLen, numHashes)
      .select(col(idCol), col("minhash_sig"),
        TextFunctions.charShingles(col(textCol), shingleLen).as("__sh"))
    val banded = signed.select(
      col(idCol), col("__sh"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(slice(col("minhash_sig"), b * rowsPerBand + 1, rowsPerBand)
          .cast("array<string>").cast("string"))
      }: _*)).as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"),
      col(idCol).as("id_a"), col("__sh").as("sh_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col(idCol).as("id_b"), col("__sh").as("sh_b"))
    val pairs = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of word shingles: per-bit weighted vote packed into
    * a long; near-dups differ in few bits (hamming distance).
    */
  def simHash(docs: DataFrame, textCol: String): DataFrame = {
    val words = TextFunctions.tokens(lower(col(textCol)))
    val hashes = transform(words, w => xxhash64(w))
    val sim = (0 until 64).map { bit =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << bit)) =!= 0, 1).otherwise(-1))
      when(vote > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    docs.withColumn("simhash", sim)
  }

  /** N-gram Jaccard similarity of two text columns (exact, for
    * verification or small candidate sets). */
  def ngramJaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    val sa = TextFunctions.wordShingles(a, n)
    val sb = TextFunctions.wordShingles(b, n)
    when(size(array_union(sa, sb)) > 0,
      size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb)))
      .otherwise(0.0)
  }
}
