package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative column→attribute mapping for flat (CSV-shaped) sources —
  * the engine's S4 (`load_csv` + `_traverse_modify`, bio.py:82-138).
  *
  * An attr_map renames source columns to namespaced attributes, builds
  * nested sub-entities (e.g. a date or sample child doc), drops unmapped
  * columns, and yields nulls for mapped-but-missing columns (the
  * reference's explicit "missing → None", bio.py:99-110). Each nested
  * sub-doc is stamped `<ns>:type` with the sub-entity type name, as the
  * reference stamps `tripl:type` (bio.py:118-125).
  *
  * The output is a nested-doc DataFrame for `DocIngest.flatten` — so
  * `spark.read.csv(...) → withAttrMap → flatten` is the full CSV ingest
  * path, one declarative plan, no row-at-a-time code.
  */
object AttrMap {

  sealed trait Spec
  /** Map attribute ← source column (missing column → null). */
  final case class Src(column: String) extends Spec
  /** Nested sub-entity: attribute ← array of one child doc whose fields
    * come from `sub` (target attr → source column), typed `typeName`. */
  final case class Nested(typeName: String, sub: Seq[(String, String)]) extends Spec

  private def srcCol(df: DataFrame, column: String): Column =
    if (df.columns.contains(column)) col(s"`$column`")
    else lit(null).cast(StringType)

  /** Apply the attr_map: returns one nested-doc row per source row. */
  def withAttrMap(df: DataFrame, attrMap: Seq[(String, Spec)],
      ns: String): DataFrame = {
    def q(attr: String) = s"$ns.$attr"
    val cols = attrMap.map {
      case (attr, Src(c)) => srcCol(df, c).as(q(attr))
      case (attr, Nested(typeName, sub)) =>
        val fields = sub.map { case (subAttr, c) =>
          srcCol(df, c).as(q(subAttr))
        } :+ lit(typeName).as(s"$ns:type")
        array(struct(fields: _*)).as(q(attr))
    }
    df.select(cols: _*)
  }
}
