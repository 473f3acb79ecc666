package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Arrow IPC file source/sink: REAL format bytes (ARROW1 magic), typed
  * round trips incl. arrays and timestamps, batch boundaries,
  * multi-file parallelism, column pruning, empty-frame schema. */
class ArrowIpcSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("round trip preserves longs, doubles, strings, bools, dates, timestamps, arrays") {
    val path = tmp("arrow-rt")
    val df = spark.sql("""
      SELECT id,
             CAST(id * 1.5 AS DOUBLE) AS d,
             CONCAT('name-', id) AS s,
             id % 2 = 0 AS b,
             DATE_ADD(DATE'2020-01-01', CAST(id AS INT)) AS dt,
             TIMESTAMP'2024-06-01 12:00:00' + make_interval(0,0,0,0,0,0,id) AS ts,
             ARRAY(CAST(id AS FLOAT), CAST(id+1 AS FLOAT)) AS emb,
             CASE WHEN id % 5 = 0 THEN NULL ELSE CONCAT('n', id) END AS maybe
      FROM range(0, 100)""")
    ArrowIpc.write(df, path, batchRows = 7) // force several record batches
    val back = spark.read.format("arrow").load(path)
    assert(back.schema === df.schema)
    assert(back.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("files carry the ARROW1 magic and are one partition each") {
    val path = tmp("arrow-magic")
    ArrowIpc.write((1L to 100L).toDF("v").repartition(4), path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".arrow"))
    assert(files.length >= 2, "multi-partition write should emit several files")
    files.foreach { f =>
      val head = java.nio.file.Files.readAllBytes(f.toPath).take(6)
      assert(new String(head, "US-ASCII") === "ARROW1", s"${f.getName} magic")
    }
    val back = spark.read.format("arrow").load(path)
    assert(back.rdd.getNumPartitions === files.length)
    assert(back.agg(sum("v")).head().getLong(0) === 5050L)
  }

  test("column pruning reads a subset in declared order") {
    val path = tmp("arrow-prune")
    ArrowIpc.write(Seq((1L, "a", 2.0), (2L, "b", 4.0)).toDF("id", "nm", "x"), path)
    val got = spark.read.format("arrow").load(path).select("x", "id")
    assert(got.schema.fieldNames.toSeq === Seq("x", "id"))
    assert(got.collect().map(r => (r.getDouble(0), r.getLong(1))).toSet ===
      Set((2.0, 1L), (4.0, 2L)))
  }

  test("an empty frame round-trips its schema") {
    val path = tmp("arrow-empty")
    ArrowIpc.write(Seq.empty[(Long, String)].toDF("id", "nm"), path)
    val back = spark.read.format("arrow").load(path)
    assert(back.schema.fieldNames.toSeq === Seq("id", "nm"))
    assert(back.count() === 0L)
  }

  test("the STREAM format (.arrows, no footer) reads too") {
    val path = tmp("arrow-stream")
    // write a genuine stream-format payload with Arrow's own writer
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "nm")
    val alloc = org.apache.spark.sql.graftshim.ArrowShim.allocator
    val batcher = new org.apache.spark.sql.graftshim.ArrowShim.RowBatcher(
      df.schema, "UTC", alloc)
    val out = new java.io.FileOutputStream(s"$path/data.arrows")
    val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
      batcher.root, null, java.nio.channels.Channels.newChannel(out))
    try {
      w.start()
      df.queryExecution.toRdd.collect().foreach(batcher.write)
      batcher.finish(); w.writeBatch(); w.end()
    } finally { w.close(); batcher.close(); out.close() }
    val back = spark.read.format("arrow").load(s"$path/data.arrows")
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("SQL: SELECT * FROM graft_arrow('/path') resolves to the same scan") {
    val path = tmp("arrow-tvf")
    ArrowIpc.write(Seq((1L, "a"), (2L, "b")).toDF("id", "nm"), path)
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
    val rows = spark.sql(s"SELECT nm FROM graft_arrow('$path') ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("a", "b"))
  }

  test("a glob reads matching files only") {
    val path = tmp("arrow-glob")
    ArrowIpc.write(Seq((1L, "x")).toDF("id", "nm"), s"$path/a")
    ArrowIpc.write(Seq((2L, "y")).toDF("id", "nm"), s"$path/b")
    val one = spark.read.format("arrow").load(s"$path/a/*.arrow")
    assert(one.collect().map(_.getLong(0)).toSeq === Seq(1L))
    val both = spark.read.format("arrow").load(s"$path/*/part-*.arrow")
    assert(both.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }
}
