package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Cross-store schema audit — the replication-ops check the reference
  * runs between its MySQL source and sqlite export
  * (/root/reference/tasks/utils/to_sqlite.py:771-917
  * `check_match_column` / `check_table_4_match_cols`): match the two
  * tables' columns (case-insensitive, with a caller-supplied name
  * normalizer and explicit alias pairs standing in for the reference's
  * `match_pairs`), then side-output the matched pairs AND the columns
  * each side could not match, so a replication job can see exactly
  * where the stores have drifted. This engine's version also compares
  * the matched columns' TYPES and primary-key membership — the two
  * drift classes the reference checks elsewhere (its
  * `alter_table_4_primary` rebuild) but never reports side by side.
  *
  * This is metadata work by nature: schemas are KB-sized regardless of
  * table size, so the audit is pure driver computation returning a
  * model-sized DataFrame — auditing a 100 TB table costs exactly one
  * manifest/footer read per side, never a data scan.
  */
object SchemaAudit {

  /** One side of the audit: a declared (TableSpec) or live
    * (`df.schema`) schema plus its primary-key columns.
    */
  final case class TableDesc(schema: StructType, primaryKey: Seq[String])

  /** Engine-neutral lowercase type names (the SQL spellings DuckDB /
    * MySQL / Trino print), so two stores' types compare by meaning, not
    * by each catalog's class names.
    */
  def canonicalType(dt: DataType): String = dt match {
    case LongType          => "bigint"
    case IntegerType       => "integer"
    case ShortType         => "smallint"
    case ByteType          => "tinyint"
    case DoubleType        => "double"
    case FloatType         => "float"
    case StringType        => "varchar"
    case BooleanType       => "boolean"
    case DateType          => "date"
    case TimestampType     => "timestamp"
    case TimestampNTZType  => "timestamp_ntz"
    case BinaryType        => "blob"
    case d: DecimalType    => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _)   => canonicalType(e) + "[]"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${canonicalType(f.dataType)}")
        .mkString("struct(", ", ", ")")
    case other             => other.simpleString
  }

  /** Audit `left` vs `right`.
    *
    * Matching: columns pair when their match keys are equal, where a
    * column's key is `normalize(lowercase(name))` — except a right-side
    * column named in `aliases` adopts its left partner's key (the
    * reference's `('vol', 'Volume')`-style pairs). Keys must be unique
    * per side (the reference's positional first-match scan degenerates
    * to the same pairing then; ambiguous keys throw rather than pair
    * arbitrarily).
    *
    * Returns one row per distinct key, ordered by it:
    * (match_key, status matched|left_only|right_only,
    *  left_col, left_type, left_pk, right_col, right_type, right_pk,
    *  type_match) — the absent side's columns are null, as is
    *  type_match for unmatched rows.
    */
  def audit(spark: SparkSession, left: TableDesc, right: TableDesc,
      normalize: String => String = identity,
      aliases: Seq[(String, String)] = Nil): DataFrame = {
    val aliasRight: Map[String, String] =
      aliases.map { case (l, r) => r.toLowerCase -> normalize(l.toLowerCase) }.toMap
    def keyed(schema: StructType, keyOf: String => String): Map[String, StructField] = {
      val m = schema.fields.map(f => keyOf(f.name) -> f)
      val dup = m.groupBy(_._1).collect { case (k, vs) if vs.length > 1 => k }
      require(dup.isEmpty,
        s"schema audit: ambiguous match keys ${dup.mkString(", ")} — tighten the normalizer")
      m.toMap
    }
    val l = keyed(left.schema, n => normalize(n.toLowerCase))
    val r = keyed(right.schema,
      n => aliasRight.getOrElse(n.toLowerCase, normalize(n.toLowerCase)))
    val lPk = left.primaryKey.map(_.toLowerCase).toSet
    val rPk = right.primaryKey.map(_.toLowerCase).toSet
    val rows = (l.keySet ++ r.keySet).toSeq.sorted.map { k =>
      (l.get(k), r.get(k)) match {
        case (Some(lf), Some(rf)) =>
          val lt = canonicalType(lf.dataType); val rt = canonicalType(rf.dataType)
          Row(k, "matched", lf.name, lt, Boolean.box(lPk(lf.name.toLowerCase)),
            rf.name, rt, Boolean.box(rPk(rf.name.toLowerCase)), Boolean.box(lt == rt))
        case (Some(lf), None) =>
          Row(k, "left_only", lf.name, canonicalType(lf.dataType),
            Boolean.box(lPk(lf.name.toLowerCase)), null, null, null, null)
        case (None, Some(rf)) =>
          Row(k, "right_only", null, null, null,
            rf.name, canonicalType(rf.dataType), Boolean.box(rPk(rf.name.toLowerCase)), null)
        case _ => throw new IllegalStateException("unreachable")
      }
    }
    val outSchema = StructType(Seq(
      StructField("match_key", StringType, nullable = false),
      StructField("status", StringType, nullable = false),
      StructField("left_col", StringType, nullable = true),
      StructField("left_type", StringType, nullable = true),
      StructField("left_pk", BooleanType, nullable = true),
      StructField("right_col", StringType, nullable = true),
      StructField("right_type", StringType, nullable = true),
      StructField("right_pk", BooleanType, nullable = true),
      StructField("type_match", BooleanType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      outSchema)
  }
}
