package graft.operators

import scala.annotation.tailrec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, explode_outer}
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** T2 — recursive normalization of nested schemas to 1NF
  * (reference TransformUtils.scala:46-76; worked semantics in
  * docs/document/01.MongoDB Ingestion.md:65-147).
  *
  * Semantics preserved exactly:
  *  - each `ArrayType(StructType)` column is `explode_outer`-ed in place —
  *    null/empty arrays yield a single row with nulls (null-preserving row
  *    multiplication); multiple array columns therefore produce the cartesian
  *    product of their explosions, as the reference documents and warns;
  *  - each `StructType` column expands to `parent.child` columns renamed by
  *    the sanitize rules of TransformUtils.scala:69 (see [[sanitizeName]]);
  *  - scalar arrays are left as-is;
  *  - repeat until no struct / array-of-struct columns remain.
  *
  * Implementation differences (same results, better plans):
  *  - all struct columns of a pass expand in ONE `select` instead of one
  *    recursion per column — the analyzed plan stays shallow on wide docs;
  *  - `@tailrec` loop instead of recursion (schema work is driver-side only;
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

  @tailrec
  def apply(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    // Pass 1: explode the first array-of-struct column (row multiplication
    // must happen one array at a time — same order the reference uses, so the
    // documented cartesian-product semantics are identical).
    fields.find(isStructArray) match {
      case Some(f) =>
        val cols = fields.map { g =>
          if (g.name == f.name) explode_outer(col(f.name)).as(f.name)
          else col(g.name)
        }
        Flatten(df.select(cols.toIndexedSeq: _*))
      case None =>
        // Pass 2: expand ALL struct columns at once.
        if (!fields.exists(_.dataType.isInstanceOf[StructType])) df
        else {
          // The reference's rename select sanitizes EVERY column name once a
          // struct expansion happens (TransformUtils.scala:66-71) — match that.
          val cols = fields.flatMap { g =>
            g.dataType match {
              case st: StructType =>
                st.fieldNames.toSeq.map(c =>
                  col(g.name).getField(c).as(sanitizeName(s"${g.name}.$c")))
              case _ => Seq(col(g.name).as(sanitizeName(g.name)))
            }
          }
          Flatten(df.select(cols.toIndexedSeq: _*))
        }
    }
  }

  def flatten(df: DataFrame): DataFrame = apply(df)
}
