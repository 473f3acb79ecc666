package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.types._

import graft.SparkSuite

/** `spark.readStream.format("graft-binlog")` — the DSv2 micro-batch source
  * over the real replication wire ([[BinlogWire]] + [[MysqldLoopback]]):
  * event delivery into the standard unbounded-DataFrame contract,
  * checkpointed exactly-once delivery across a query restart, and the
  * end-to-end composition with the [[MultiTableSink]] demux. */
class BinlogStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private val Password = "repl-pw"
  private val ColumnsJson =
    """{"shop.orders": ["id", "item"], "shop.users": ["uid", "name"]}"""

  private def stream(port: Int) =
    spark.readStream.format("graft-binlog")
      .option("host", "127.0.0.1").option("port", port)
      .option("user", "repl").option("password", Password)
      .option("columns", ColumnsJson)
      .load()

  test("micro-batch stream delivers the binlog as CDC rows") {
    val m = new MysqldLoopback(Password)
    try {
      val q = stream(m.port).writeStream
        .format("memory").queryName("binlog_events").outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table("binlog_events")
        .select("db", "table", "op", "offset", "payload")
        .as[(String, String, String, Long, String)].collect().sortBy(_._4).toSeq
      assert(rows.map(r => (r._2, r._3)) === Seq(
        ("orders", "insert"), ("users", "insert"),
        ("orders", "update"), ("users", "delete")))
      assert(rows.map(r => BinlogOffset.decode(r._4)) === Seq(
        BinlogOffset(1, 100), BinlogOffset(1, 200),
        BinlogOffset(2, 120), BinlogOffset(2, 180)))
      assert(rows(2)._5 === """{"id":1,"item":"gadget"}""")
    } finally m.stop()
  }

  test("restart from checkpoint does not re-deliver committed events") {
    val m = new MysqldLoopback(Password)
    val ckpt = Files.createTempDirectory("graft-binlog-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Long] // offsets, driver-side
    def run(): Unit = {
      val q = stream(m.port).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("offset").as[Long].collect() }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      run()
      val first = seen.synchronized(seen.sorted.toSeq)
      assert(first === Seq(BinlogOffset(1, 100), BinlogOffset(1, 200),
        BinlogOffset(2, 120), BinlogOffset(2, 180)).map(_.encoded))
      run() // server still retains the binlog; nothing may be re-emitted
      assert(seen.synchronized(seen.size) === 4)
    } finally m.stop()
  }

  test("CdcStreamApp --binlog-host wires the live wire source from the table registry") {
    val m = new MysqldLoopback(Password)
    val root = Files.createTempDirectory("graft-cdcapp-lake").toString
    val ckpt = Files.createTempDirectory("graft-cdcapp-ckpt").toString
    val conf = graft.core.ConfigLayer(Map(
      "shop.orders.schema" -> "id LONG, item STRING",
      "shop.orders.hoodie.datasource.write.recordkey.field" -> "id",
      "shop.orders.hoodie.datasource.write.precombine.field" -> "id",
      "shop.users.schema" -> "uid LONG, name STRING",
      "shop.users.hoodie.datasource.write.recordkey.field" -> "uid",
      "shop.users.hoodie.datasource.write.precombine.field" -> "uid"))
    val specs = graft.apps.CdcStreamApp.tableSpecs(conf)
    assert(specs.map(s => (s.db, s.table)) ===
      Seq(("shop", "orders"), ("shop", "users")))
    val cli = Map(
      "binlog-host" -> "127.0.0.1", "binlog-port" -> m.port.toString,
      "binlog-user" -> "repl", "binlog-password" -> Password,
      "binlog-index" -> "1", "binlog-file-offset" -> "4")
    try {
      val events = graft.apps.CdcStreamApp.source(spark, cli, specs)
      val sink = new MultiTableSink(s"$root/{db}/ods_{db}_{table}", specs, 1)
      val q = sink.start(events, ckpt)
      try q.processAllAvailable() finally q.stop()
      val orders = spark.read.parquet(s"$root/shop/ods_shop_orders/data")
        .select("id", "item").as[(Long, String)].collect().toSet
      assert(orders === Set((1L, "gadget"))) // registry-mapped column names
    } finally m.stop()
  }

  test("binlog stream composes with the multi-table demux sink end to end") {
    val m = new MysqldLoopback(Password)
    val root = Files.createTempDirectory("graft-binlog-lake").toString
    val ckpt = Files.createTempDirectory("graft-binlog-lake-ckpt").toString
    val ordersSchema = StructType(Seq(
      StructField("id", LongType), StructField("item", StringType)))
    val usersSchema = StructType(Seq(
      StructField("uid", LongType), StructField("name", StringType)))
    val sink = new MultiTableSink(s"$root/{db}/ods_{db}_{table}",
      Seq(CdcTableSpec("shop", "orders", ordersSchema, Seq("id"), "id"),
        CdcTableSpec("shop", "users", usersSchema, Seq("uid"), "uid")), 1)
    try {
      val q = sink.start(stream(m.port), ckpt)
      try q.processAllAvailable() finally q.stop()
      val orders = spark.read.parquet(s"$root/shop/ods_shop_orders/data")
        .select("id", "item").as[(Long, String)].collect().toSet
      assert(orders === Set((1L, "gadget"))) // insert superseded by update
      val usersPath = s"$root/shop/ods_shop_users/data"
      val users =
        if (!new java.io.File(usersPath).exists) Set.empty[(Long, String)]
        else spark.read.parquet(usersPath)
          .select("uid", "name").as[(Long, String)].collect().toSet
      assert(users === Set.empty) // insert then delete resolves to absent
    } finally m.stop()
  }
}
