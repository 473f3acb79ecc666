package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkSuite

/** `spark.readStream.format("graft-pg")` — the DSv2 micro-batch source
  * over the real walsender wire ([[PgWire]] + [[PgLoopback]]): delivery
  * into the standard unbounded-DataFrame contract and checkpointed
  * exactly-once restart (slot replays whole transactions; the source must
  * trim already-committed LSNs). */
class PgStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private val Password = "wal-pw"

  private def stream(port: Int) =
    spark.readStream.format("graft-pg")
      .option("host", "127.0.0.1").option("port", port)
      .option("user", "repl").option("password", Password)
      .option("database", "shop").option("slot", "s1")
      .option("publication", "pub1")
      .load()

  test("micro-batch stream delivers pgoutput changes as CDC rows") {
    val m = new PgLoopback(Password)
    try {
      val q = stream(m.port).writeStream
        .format("memory").queryName("pg_events").outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table("pg_events")
        .select("db", "table", "op", "offset", "payload")
        .as[(String, String, String, Long, String)].collect().sortBy(_._4).toSeq
      assert(rows.map(r => (r._2, r._3, r._4)) === Seq(
        ("orders", "insert", 110L), ("users", "insert", 120L),
        ("orders", "update", 310L), ("users", "delete", 320L),
        ("orders", "truncate", 450L)))
      assert(rows(2)._5.startsWith("""{"id":"1","item":"gadget""""))
    } finally m.stop()
  }

  test("restart from checkpoint does not re-deliver committed transactions") {
    val m = new PgLoopback(Password)
    val ckpt = Files.createTempDirectory("graft-pg-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = stream(m.port).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("offset").as[Long].collect() }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      run()
      assert(seen.sorted.toSeq === Seq(110L, 120L, 310L, 320L, 450L))
      run() // new query, same checkpoint: slot would replay, source must not
      assert(seen.sorted.toSeq === Seq(110L, 120L, 310L, 320L, 450L),
        "restart re-delivered committed LSNs")
    } finally m.stop()
  }

  test("maxEventsPerBatch paces delivery without loss") {
    val m = new PgLoopback(Password)
    try {
      val sizes = mutable.ArrayBuffer.empty[Long]
      val paced = spark.readStream.format("graft-pg")
        .option("host", "127.0.0.1").option("port", m.port)
        .option("user", "repl").option("password", Password)
        .option("database", "shop").option("slot", "s1")
        .option("publication", "pub1")
        .option("maxEventsPerBatch", "2") // source option: admission control
        .load()
      val q = paced.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.synchronized { sizes += b.count() }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      val delivered = sizes.filter(_ > 0)
      assert(delivered.sum === 5L, s"expected all 5 events, got $sizes")
      assert(delivered.forall(_ <= 2L), s"a batch exceeded the cap: $sizes")
    } finally m.stop()
  }

  test("pg stream composes with the multi-table demux sink end to end") {
    import org.apache.spark.sql.types._
    val m = new PgLoopback(Password)
    val root = Files.createTempDirectory("graft-pg-lake").toString
    val ckpt = Files.createTempDirectory("graft-pg-lake-ckpt").toString
    // pgoutput v1 ships text-format tuples, so the landing schema is
    // string-typed; numeric casts belong to the downstream transform
    val ordersSchema = StructType(Seq(
      StructField("id", StringType), StructField("item", StringType)))
    val usersSchema = StructType(Seq(
      StructField("uid", StringType), StructField("name", StringType),
      StructField("bio", StringType)))
    val sink = new MultiTableSink(s"$root/{db}/ods_{db}_{table}",
      Seq(CdcTableSpec("public", "orders", ordersSchema, Seq("id"), "id"),
        CdcTableSpec("public", "users", usersSchema, Seq("uid"), "uid")), 1)
    try {
      // the demux treats "truncate" like an unknown op (skips it): filter
      // to row ops, the composition under test
      val rowOps = stream(m.port).filter("op IN ('insert','update','delete')")
      val q = sink.start(rowOps, ckpt)
      try q.processAllAvailable() finally q.stop()
      val orders = spark.read.parquet(s"$root/public/ods_public_orders/data")
        .select("id", "item").as[(String, String)].collect().toSet
      assert(orders === Set(("1", "gadget"))) // insert superseded by update
      val usersPath = s"$root/public/ods_public_users/data"
      val users =
        if (!new java.io.File(usersPath).exists) Set.empty[String]
        else spark.read.parquet(usersPath)
          .select("uid").as[String].collect().toSet
      assert(users === Set.empty) // insert then delete resolves to absent
    } finally m.stop()
  }
}
