package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.Dedup.semDedup]]'s documented
  * 100 TB discipline: pick k ∝ n / targetCellSize so the within-cell
  * scan stays O(n · targetCellSize) instead of O(n² / k).
  *
  * The dd_semdedup / dd_doc_semdedup QUERIES pin k = 8 deterministic
  * centroids (an oracle fixture — DuckDB replays the argmin
  * assignment verbatim), so on a mutated corpus whose DISTINCT-vector
  * population grows linearly their cost is quadratic BY CONSTRUCTION
  * of the fixture, not of the operator. This probe runs the SAME
  * operator on the same corpora with the scale-path k (centroids =
  * a deterministic hash-sample of the corpus itself, k = n/cellSize)
  * and prints wall seconds, so the decade ratio of the OPERATOR under
  * its documented discipline is a measured number rather than a
  * scaladoc claim.
  *
  * Usage: runMain graft.tools.SemDedupScaleProbe dir [dir...]
  *   env SPARK_GRAFT_CELL_SIZE (default 400): target vectors/cell.
  */
object SemDedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cellSize = sys.env.getOrElse("SPARK_GRAFT_CELL_SIZE", "400").toInt
    val spark = graft.core.GraftSession.registerFunctions(
      graft.core.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt
      ).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs) {
      val e = graft.core.Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val n = e.count()
      val k = math.max(8L, n / cellSize)
      // deterministic hash-sample of the corpus as centroids — the
      // kmeansTrain stand-in (k seeds, not k trained means; cell sizes
      // are hash-uniform which is what the probe needs)
      val cents = e.filter(pmod(xxhash64(col("vec_id")), lit(n)) < k)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val kActual = cents.count()
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.semDedup(
        e, "vec_id", "v", cents, "cent_id", "cv", eps = 0.9)
      val kept = out.agg(sum(col("kept"))).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[semdedup-scale] dir=$d n=$n k=$kActual cellSize~$cellSize " +
        f"kept=$kept wall=$secs%.1f s")
    }
    spark.stop()
  }
}
