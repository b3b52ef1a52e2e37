package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J5 — the cross-vendor code-mapping builder
  * (/root/reference/tasks/merge/code_mapping.py:74-117,197-255): each
  * vendor names the same instrument differently (`ths_code`,
  * `wind_code`, …); the mapping table links them so every downstream
  * merge can join on one `unique_code`. New vendor codes are matched to
  * existing rows BY NORMALIZED FULL NAME — the only key the vendors
  * share — updating the matched row's missing code column; unmatched
  * codes append as single-vendor rows.
  *
  * Scale shape: one anti-join (new codes), one name-equi-join against
  * the other vendor's info table, both on engine-hashed string keys —
  * instrument universes are small enough that AQE broadcasts them, but
  * nothing here requires it.
  */
object CodeMapping {

  /** F7-style name key: case-folded and trimmed, so vendor whitespace /
    * case quirks don't break the only shared join key. */
  def normName(c: Column): Column = upper(trim(c))

  /** Exchange suffix after the last '.' — the reference's
    * `substring(code, locate('.', code) + 1, …)`. */
  def market(code: Column): Column = substring_index(code, ".", -1)

  /** Seed the mapping from a wind-side info table `(wind_code, …)`:
    * `unique_code = 'w.' || wind_code` (ref code_mapping.py:139-146). */
  def fromWind(wind: DataFrame, capType: String): DataFrame =
    wind.select(
      concat(lit("w."), col("wind_code")).as("unique_code"),
      col("wind_code"),
      lit(null).cast("string").as("ths_code"),
      market(col("wind_code")).as("market"),
      lit(capType).as("type"))

  /** One ifind-side refresh (ref code_mapping.py:74-117): rows of
    * `ifind (ths_code, full_name)` whose ths_code the mapping lacks are
    * name-matched against `wind (wind_code, full_name)`. Matches RELINK
    * the existing wind row — unique_code flips to the ifind identity and
    * market re-derives from ths_code, exactly the reference's UPDATE
    * field list; misses become pure-ifind rows. Returns
    * `(updatedRows, insertedRows)` shaped like the mapping schema, ready
    * for a keyed upsert.
    */
  def refreshFromIfind(mapping: DataFrame, ifind: DataFrame, wind: DataFrame,
      capType: String): (DataFrame, DataFrame) = {
    val fresh = ifind
      .select(col("ths_code"), normName(col("full_name")).as("__k"))
      .join(mapping.where(col("ths_code").isNotNull).select(col("ths_code")),
        Seq("ths_code"), "left_anti")
    val windKeyed = wind.select(col("wind_code"), normName(col("full_name")).as("__k"))
    val matched = fresh.join(windKeyed, Seq("__k"))
    val updated = mapping
      .join(matched.select(col("wind_code"), col("ths_code").as("__ths")), Seq("wind_code"))
      .select(
        concat(lit("i."), col("__ths")).as("unique_code"),
        col("wind_code"),
        col("__ths").as("ths_code"),
        market(col("__ths")).as("market"),
        lit(capType).as("type"))
    val inserted = fresh.join(windKeyed, Seq("__k"), "left_anti")
      .select(
        concat(lit("i."), col("ths_code")).as("unique_code"),
        lit(null).cast("string").as("wind_code"),
        col("ths_code"),
        market(col("ths_code")).as("market"),
        lit(capType).as("type"))
    (updated, inserted)
  }

  /** Fuzzy name matching for the mapping rows exact [[normName]] equality
    * misses — vendor names differ by typos/truncations, so the last
    * resort is a bounded-edit-distance match. Exhaustive name×name is
    * quadratic; the standard entity-resolution fix is BLOCKING: names
    * only compare inside (first character, length band) blocks, with
    * the right side exploded to adjacent bands so a ≤`maxDistance`
    * length change can't cross out of reach (band width > maxDistance).
    * Assumes edits preserve the first character — the usual trade-off;
    * recall lost to first-char typos is the price of not being O(n²).
    *
    * Returns (name_l, name_r, dist) for pairs with levenshtein ≤
    * `maxDistance`.
    */
  def fuzzyNameMatch(left: DataFrame, right: DataFrame,
      leftName: String, rightName: String, maxDistance: Int): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 4,
      s"maxDistance=$maxDistance out of the blocking-safe range 0..3")
    val bandW = maxDistance + 2 // band width > maxDistance
    val l = left.select(col(leftName).as("name_l"))
      .withColumn("__c", substring(col("name_l"), 1, 1))
      .withColumn("__band", (length(col("name_l")) / bandW).cast("int"))
    val r = right.select(col(rightName).as("name_r"))
      .withColumn("__c", substring(col("name_r"), 1, 1))
      .withColumn("__b0", (length(col("name_r")) / bandW).cast("int"))
      .withColumn("__band",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    l.join(r, Seq("__c", "__band"))
      .withColumn("dist", levenshtein(col("name_l"), col("name_r")))
      .filter(col("dist") <= maxDistance)
      .select(col("name_l"), col("name_r"), col("dist").cast("long").as("dist"))
      .dropDuplicates("name_l", "name_r")
  }
}
