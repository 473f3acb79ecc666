package graft.sources

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import graft.SparkSuite

/** [[AvroSource]]: container-file round trips (primitives + logical
  * types), sync-marker split reads, codec transparency, and by-name
  * schema evolution across files. */
class AvroSourceSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("avro-src")
    Files.delete(d)
    d.toString
  }

  test("round trip: primitives, date/timestamp/decimal logicals, null handling") {
    val dir = tmp()
    val df = Seq(
      (1L, 7, 1.5, 2.5f, true, "widget", Date.valueOf("2024-03-01"),
        Timestamp.valueOf("2024-03-01 10:30:00.123456"),
        BigDecimal("12345.67")),
      (2L, 8, -0.5, 0f, false, "bolt", Date.valueOf("1969-12-31"),
        Timestamp.valueOf("1969-12-31 23:00:00.0"), BigDecimal("-0.01")))
      .toDF("a", "b", "c", "d", "e", "f", "g", "h", "i")
      .withColumn("i", org.apache.spark.sql.functions
        .col("i").cast("decimal(9,2)"))
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq)
    val got = back.orderBy("a").collect().toSeq
    val want = df.orderBy("a").collect().toSeq
    assert(got === want)
    // nulls survive (every field is a nullable union)
    val dir2 = tmp()
    val withNulls = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "s")
    AvroSource.write(withNulls, dir2)
    assert(AvroSource.read(spark, dir2).orderBy("k")
      .collect().map(_.isNullAt(1)).toSeq === Seq(true, false))
  }

  test("nested struct, array, and map round trip") {
    val dir = tmp()
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Map("a" -> 1L, "b" -> 2L), (10L, "in")),
      (2L, Seq.empty[Double], Map.empty[String, Long], (20L, "out")))
      .toDF("k", "arr", "m", "nested")
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir).orderBy("k")
    assert(back.selectExpr("get(arr, 1)").as[Option[Double]].collect().toSeq ===
      Seq(Some(2.0), None))
    assert(back.selectExpr("try_element_at(m, 'b')")
      .as[Option[Long]].collect().toSeq === Seq(Some(2L), None))
    assert(back.selectExpr("nested._2").as[String].collect().toSeq ===
      Seq("in", "out"))
  }

  test("sync-marker splits: tiny maxSplitBytes reads every row exactly once") {
    val dir = tmp()
    val rows = (1L to 20000L).map(i => (i, s"payload-$i-" + "x" * 40))
    // small sync interval → many blocks → many split points
    AvroSource.write(rows.toDF("id", "payload").coalesce(2), dir,
      syncIntervalBytes = 2048)
    val whole = AvroSource.read(spark, dir)
    val split = AvroSource.read(spark, dir, maxSplitBytes = 16 * 1024)
    assert(whole.count() === 20000L)
    assert(split.count() === 20000L, "split read lost or duplicated rows")
    assert(split.agg(org.apache.spark.sql.functions.sum("id")).as[Long].head ===
      rows.map(_._1).sum)
    assert(split.rdd.getNumPartitions > whole.rdd.getNumPartitions,
      "a tiny split budget must fan out more tasks than one per file")
  }

  test("codec transparency: deflate and plain files read together") {
    val dir = tmp()
    AvroSource.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1),
      s"$dir/plain")
    AvroSource.write(Seq((3L, "c"), (4L, "d")).toDF("id", "s").coalesce(1),
      s"$dir/packed", codec = "deflate")
    val back = AvroSource.read(spark, s"$dir/*/part-*.avro")
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("schema evolution by name: a file missing a column reads null") {
    val dir = tmp()
    AvroSource.write(Seq((1L, "full", 9L)).toDF("id", "s", "extra")
      .coalesce(1), s"$dir/a")
    // second file lacks `extra` — but the FIRST (path-ordered) file's
    // header wins the schema, and the narrow file's rows read null for it
    AvroSource.write(Seq((2L, "narrow")).toDF("id", "s").coalesce(1),
      s"$dir/b")
    val back = AvroSource.read(spark, s"$dir/*/part-*.avro")
    assert(back.columns.toSeq === Seq("id", "s", "extra"))
    assert(back.orderBy("id").selectExpr("extra")
      .as[Option[Long]].collect().toSeq === Seq(Some(9L), None))
  }

  test("loud failures: empty glob and non-record top level") {
    intercept[IllegalArgumentException] {
      AvroSource.read(spark, tmp() + "/*.avro")
    }
  }
}
