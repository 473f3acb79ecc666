package graft.sink

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.sources.DeltaRead

/** [[DeltaWrite]] ↔ [[DeltaRead]] round-trip: create / partition
  * replacement / checkpoint / log vacuum, percent-encoded paths for
  * partition values with spaces, and protocol-conformant log contents. */
class DeltaWriteSpec extends SparkSuite {

  import spark.implicits._

  private def tmp(): String = {
    val d = Files.createTempDirectory("delta-write")
    Files.delete(d) // create() requires a fresh path
    d.toString
  }

  test("create → replacePartition → checkpoint → vacuum round-trips") {
    val root = tmp()
    val df = Seq((1L, "widget", "A"), (2L, "bolt", "A"), (3L, "nut", "B"))
      .toDF("id", "item", "grp")
    DeltaWrite.create(df, root, Seq("grp"))
    assert(DeltaRead.snapshot(spark, root).count() === 3L)
    // rewrite partition A with upper-cased items
    DeltaWrite.replacePartition(
      Seq((1L, "WIDGET", "A"), (2L, "BOLT", "A")).toDF("id", "item", "grp"),
      root, "grp", "A")
    val afterRewrite = DeltaRead.snapshot(spark, root)
      .select("id", "item", "grp").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(afterRewrite === Seq((1L, "WIDGET", "A"), (2L, "BOLT", "A"),
      (3L, "nut", "B")))
    // time travel still sees v0
    assert(DeltaRead.snapshot(spark, root, versionAsOf = Some(0L))
      .where("item = 'widget'").count() === 1L)
    // checkpoint + vacuum: v0/v1 JSON gone, table still readable
    DeltaWrite.checkpoint(spark, root)
    DeltaWrite.vacuumLog(spark, root)
    assert(!Files.exists(Paths.get(root, "_delta_log", f"${0L}%020d.json")))
    val afterVacuum = DeltaRead.snapshot(spark, root)
      .select("id", "item").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(afterVacuum === Seq((1L, "WIDGET"), (2L, "BOLT"), (3L, "nut")))
    // partition column typed + declared order preserved via schemaString
    assert(DeltaRead.snapshot(spark, root).schema.fieldNames.toSeq
      === Seq("id", "item", "grp"))
  }

  test("partition values with spaces percent-encode per the protocol") {
    val root = tmp()
    val df = Seq((1L, "4-NOT SPECIFIED"), (2L, "1-URGENT"))
      .toDF("id", "prio")
    DeltaWrite.create(df, root, Seq("prio"))
    // the log's add.path must be URI-parseable (encoded), and the read
    // must resolve it back to the on-disk file
    val logLines = Files.readAllLines(
      Paths.get(root, "_delta_log", f"${0L}%020d.json"))
    val addLines = logLines.toArray.map(_.toString).filter(_.contains("\"add\""))
    assert(addLines.exists(_.contains("4-NOT%20SPECIFIED")),
      s"space not percent-encoded in add.path: ${addLines.mkString("\n")}")
    val rows = DeltaRead.snapshot(spark, root)
      .select("id", "prio").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "4-NOT SPECIFIED"), (2L, "1-URGENT")))
  }
}
