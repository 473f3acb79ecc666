package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite

/** T2 flatten — the documented semantics of the reference
  * (docs/document/01.MongoDB Ingestion.md:65-147):
  *  - single array-of-struct explodes null-preservingly (2-element array → 2
  *    rows; null/empty array → 1 row of nulls);
  *  - two arrays → cartesian product (|locs|=2 × |arr|=3 → 6 rows);
  *  - struct columns expand to parent_child with sanitized names;
  *  - already-flat frames are untouched (idempotence). */
class FlattenSpec extends SparkSuite {

  private def doc(withArrs: (Int, Int)) = {
    val locSchema = StructType(Seq(
      StructField("loc_id", StringType), StructField("x", DoubleType)))
    val arrSchema = StructType(Seq(
      StructField("id", StringType), StructField("a", DoubleType)))
    val schema = StructType(Seq(
      StructField("_id", StructType(Seq(StructField("oid", StringType)))),
      StructField("id", DoubleType),
      StructField("locs", ArrayType(locSchema)),
      StructField("arr", ArrayType(arrSchema))))
    val locs = (1 to withArrs._1).map(i => Row(s"l$i", i.toDouble))
    val arr = (1 to withArrs._2).map(i => Row(s"a$i", i.toDouble))
    spark.createDataFrame(
      java.util.List.of(Row(Row("OID1"), 1.0, locs, arr)), schema)
  }

  test("two arrays produce the cartesian product (2 x 3 = 6 rows)") {
    val flat = Flatten(doc((2, 3)))
    assert(flat.count() === 6)
    assert(flat.columns.toSet === Set("_id_oid", "id", "locs_loc_id", "locs_x", "arr_id", "arr_a"))
    // every (loc, arr) combination appears exactly once
    val combos = flat.select("locs_loc_id", "arr_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(combos === (for { l <- 1 to 2; a <- 1 to 3 } yield (s"l$l", s"a$a")).toSet)
  }

  test("null and empty arrays preserve the row with nulls (explode_outer)") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("xs", ArrayType(StructType(Seq(StructField("v", IntegerType)))))))
    val df = spark.createDataFrame(java.util.List.of(
      Row(1, null), Row(2, Seq.empty[Row]), Row(3, Seq(Row(7)))), schema)
    val flat = Flatten(df)
    val got = flat.collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSet
    assert(got === Set((1, None), (2, None), (3, Some(7))))
  }

  test("struct expansion sanitizes names and is idempotent on flat frames") {
    val schema = StructType(Seq(
      StructField("s", StructType(Seq(
        StructField("a.b", StringType), StructField("c-d e", StringType))))))
    val df = spark.createDataFrame(java.util.List.of(Row(Row("x", "y"))), schema)
    val flat = Flatten(df)
    assert(flat.columns.toSet === Set("s_a_b", "s_cde"))
    val again = Flatten(flat)
    assert(again.columns.toSeq === flat.columns.toSeq)
    assert(again.collect().toSeq === flat.collect().toSeq)
  }

  test("nested struct-in-struct flattens recursively") {
    val inner = StructType(Seq(StructField("deep", StringType)))
    val schema = StructType(Seq(
      StructField("outer", StructType(Seq(StructField("mid", inner))))))
    val df = spark.createDataFrame(java.util.List.of(Row(Row(Row("v")))), schema)
    val flat = Flatten(df)
    assert(flat.columns.toSeq === Seq("outer_mid_deep"))
    assert(flat.head.getString(0) === "v")
  }

  test("column order matches the reference's worked Mongo example: " +
      "exploded/expanded columns move to the END of the select") {
    // docs/document/01.MongoDB Ingestion.md:100-147, with the connector's
    // alphabetically-inferred schema (_id, arr, id, locs). The reference
    // processes the first nested field per recursion and appends its
    // output (TransformUtils.scala:59-70); replaying that by hand gives
    // exactly the documented table header:
    //   id | _id_oid | arr_id | arr_a | arr_b | locs_loc_id | locs_x | locs_y
    val locSchema = StructType(Seq(StructField("loc_id", StringType),
      StructField("x", DoubleType), StructField("y", DoubleType)))
    val arrSchema = StructType(Seq(StructField("id", StringType),
      StructField("a", DoubleType), StructField("b", DoubleType)))
    val schema = StructType(Seq(
      StructField("_id", StructType(Seq(StructField("oid", StringType)))),
      StructField("arr", ArrayType(arrSchema)),
      StructField("id", DoubleType),
      StructField("locs", ArrayType(locSchema))))
    val locs = Seq(Row("Axyxuii=", 12.65, 74.76), Row("WWsexo=", 32.15, 18.19))
    val arr = Seq(Row("Axyxuii=", 12.65, 74.76), Row("WWsexo=", 32.15, 18.19),
      Row("WWsexo=", 32.15, 18.19))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Row("6241579fa50aeed0adfbe58e"), arr, 1.0, locs)),
      schema)
    val flat = Flatten(df)
    assert(flat.columns.toSeq === Seq("id", "_id_oid", "arr_id", "arr_a",
      "arr_b", "locs_loc_id", "locs_x", "locs_y"),
      "column order diverged from the reference's documented flatten output")
    assert(flat.count() === 6) // 3 arr × 2 locs cartesian
  }

  test("sanitizeName follows the reference's replacement order") {
    assert(Flatten.sanitizeName("a.b") === "a_b")
    assert(Flatten.sanitizeName("a$b") === "a_b")
    assert(Flatten.sanitizeName("a__b") === "a_b")
    assert(Flatten.sanitizeName("a b-c") === "abc")
  }
}
