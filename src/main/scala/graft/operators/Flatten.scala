package graft.operators

import scala.annotation.tailrec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, explode_outer}
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** T2 — recursive normalization of nested schemas to 1NF
  * (reference TransformUtils.scala:46-76; worked semantics in
  * docs/document/01.MongoDB Ingestion.md:65-147).
  *
  * Semantics preserved exactly (including COLUMN ORDER — a byte-level
  * parity consumer diffing against the reference sees identical schemas):
  *  - each recursion processes the FIRST nested field in schema order —
  *    struct or array-of-struct, whichever comes first — and moves its
  *    output to the END of the select (`fieldNamesExcludingArray ++
  *    explode` / `filter(_ != fieldName) ++ childFieldnames`,
  *    TransformUtils.scala:59-70);
  *  - `ArrayType(StructType)` columns are `explode_outer`-ed — null/empty
  *    arrays yield a single row with nulls (null-preserving row
  *    multiplication); multiple array columns therefore produce the
  *    cartesian product of their explosions, as the reference documents
  *    and warns (worked example: docs/document/01.MongoDB
  *    Ingestion.md:100-147);
  *  - each `StructType` column expands to `parent.child` columns renamed
  *    by the sanitize rules of TransformUtils.scala:69 (see
  *    [[sanitizeName]]); the struct-expansion select renames EVERY column
  *    through the sanitizer (the array select renames none) — matched;
  *  - scalar arrays are left as-is;
  *  - repeat until no struct / array-of-struct columns remain.
  *
  * Implementation differences (same results, same column order):
  *  - `@tailrec` loop instead of recursion (schema work is driver-side
  *    only; Catalyst's CollapseProject folds the per-pass selects, so
  *    executors see a single select/generate pipeline, fully codegen'd);
  *  - generated columns go through `col(...)` with multi-part names rather
  *    than `selectExpr` string splicing, so weird field names can't be
  *    misparsed as SQL.
  */
object Flatten {

  /** Column-name sanitization of TransformUtils.scala:69, order-faithful:
    * `.`→`_`, `$`→`_`, then `__`→`_`, spaces and dashes removed. */
  def sanitizeName(name: String): String =
    name.replace(".", "_").replace("$", "_").replace("__", "_")
      .replace(" ", "").replace("-", "")

  private def isStructArray(f: StructField): Boolean = f.dataType match {
    case ArrayType(_: StructType, _) => true
    case _                           => false
  }

  private def isNested(f: StructField): Boolean =
    isStructArray(f) || f.dataType.isInstanceOf[StructType]

  @tailrec
  def apply(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    // One nested field per recursion — the FIRST in schema order, exactly
    // like the reference's for-loop with early return — with its output
    // moved to the END of the select. Processing order decides both the
    // explosion (cartesian) order and the final column order.
    fields.find(isNested) match {
      case None => df
      case Some(f) if isStructArray(f) =>
        val others = fields.collect { case g if g.name != f.name => col(g.name) }
        Flatten(df.select(
          (others :+ explode_outer(col(f.name)).as(f.name)).toIndexedSeq: _*))
      case Some(f) =>
        val st = f.dataType.asInstanceOf[StructType]
        // the reference's struct-expansion select sanitizes every column
        // name (TransformUtils.scala:66-71) — match that
        val others = fields.collect { case g if g.name != f.name =>
          col(g.name).as(sanitizeName(g.name)) }
        val children = st.fieldNames.toSeq.map(c =>
          col(f.name).getField(c).as(sanitizeName(s"${f.name}.$c")))
        Flatten(df.select((others ++ children).toIndexedSeq: _*))
    }
  }

  def flatten(df: DataFrame): DataFrame = apply(df)
}
