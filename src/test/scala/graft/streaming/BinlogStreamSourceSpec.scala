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

  test("restart resumes from the CHECKPOINTED offset even when the server " +
      "purged the configured start (retention churn)") {
    val m = new MysqldLoopback(Password)
    val ckpt = Files.createTempDirectory("graft-binlog-purge-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Long]
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
      run() // first run drains all 4 events; checkpoint commits (2, 180)
      assert(seen.synchronized(seen.size) === 4)
      // server retention churn: everything below the checkpointed position
      // is gone — a dump from the configured start (1, 4) now errors with
      // the fatal 1236. The restart must dump from (2, 180) instead.
      m.purgeBelow(2, 180)
      run()
      assert(seen.synchronized(seen.size) === 4) // resumed clean, no re-read
    } finally m.stop()
  }

  test("the full typed column surface lands end-to-end through the demux sink") {
    val m = new MysqldLoopback(Password, extended = true)
    val root = Files.createTempDirectory("graft-alltypes-lake").toString
    val ckpt = Files.createTempDirectory("graft-alltypes-ckpt").toString
    val allTypesCols = Seq("c_tiny", "c_short", "c_int24", "c_float",
      "c_double", "c_dec", "c_date", "c_dt", "c_ts", "c_time", "c_timef",
      "c_year", "c_text", "c_char", "c_enum", "c_set", "c_bit")
    val schema = StructType(Seq(
      StructField("c_tiny", IntegerType), StructField("c_short", IntegerType),
      StructField("c_int24", IntegerType), StructField("c_float", DoubleType),
      StructField("c_double", DoubleType),
      StructField("c_dec", DecimalType(14, 4)),
      StructField("c_date", StringType), StructField("c_dt", StringType),
      StructField("c_ts", StringType), StructField("c_time", StringType),
      StructField("c_timef", StringType), StructField("c_year", IntegerType),
      StructField("c_text", StringType), StructField("c_char", StringType),
      StructField("c_enum", IntegerType), StructField("c_set", IntegerType),
      StructField("c_bit", LongType)))
    val src = spark.readStream.format("graft-binlog")
      .option("host", "127.0.0.1").option("port", m.port)
      .option("user", "repl").option("password", Password)
      .option("columns",
        s"""{"shop.alltypes": [${allTypesCols.map("\"" + _ + "\"").mkString(",")}]}""")
      .load()
    val sink = new MultiTableSink(s"$root/{db}/ods_{db}_{table}",
      Seq(CdcTableSpec("shop", "alltypes", schema, Seq("c_tiny"), "c_tiny")), 1)
    try {
      val q = sink.start(src, ckpt)
      try q.processAllAvailable() finally q.stop()
      val rows = spark.read.parquet(s"$root/shop/ods_shop_alltypes/data")
        .orderBy("c_tiny")
        .collect()
      assert(rows.length === 2)
      val r1 = rows.find(_.getAs[Int]("c_tiny") == -5).get
      assert(r1.getAs[Int]("c_short") === -1234)
      assert(r1.getAs[Int]("c_int24") === -70000)
      assert(r1.getAs[Double]("c_float") === 1.25)
      assert(r1.getAs[Double]("c_double") === -2.5)
      assert(r1.getAs[java.math.BigDecimal]("c_dec")
        === new java.math.BigDecimal("-123456789.0123"))
      assert(r1.getAs[String]("c_dt") === "2024-02-29 13:14:15.250")
      assert(r1.getAs[String]("c_time") === "-12:34:56")
      assert(r1.getAs[Int]("c_year") === 2024)
      assert(r1.getAs[String]("c_text") === "héllo \"q\"\n")
      assert(r1.getAs[Long]("c_bit") === 2748L)
      val r2 = rows.find(_.getAs[Int]("c_tiny") == 7).get
      assert(r2.isNullAt(r2.fieldIndex("c_dec")) && r2.isNullAt(r2.fieldIndex("c_text")))
      assert(r2.getAs[String]("c_timef") === "01:02:03.04")
    } finally m.stop()
  }

  test("MINIMAL/NOBLOB partial row images land end-to-end through the demux " +
      "sink: omitted columns arrive absent (null through the table schema), " +
      "later columns stay aligned") {
    val m = new MysqldLoopback(Password, extended = true, partialImage = true)
    val root = Files.createTempDirectory("graft-partial-lake").toString
    val ckpt = Files.createTempDirectory("graft-partial-ckpt").toString
    val allTypesCols = Seq("c_tiny", "c_short", "c_int24", "c_float",
      "c_double", "c_dec", "c_date", "c_dt", "c_ts", "c_time", "c_timef",
      "c_year", "c_text", "c_char", "c_enum", "c_set", "c_bit")
    val schema = StructType(Seq(
      StructField("c_tiny", IntegerType), StructField("c_short", IntegerType),
      StructField("c_int24", IntegerType), StructField("c_float", DoubleType),
      StructField("c_double", DoubleType),
      StructField("c_dec", DecimalType(14, 4)),
      StructField("c_date", StringType), StructField("c_dt", StringType),
      StructField("c_ts", StringType), StructField("c_time", StringType),
      StructField("c_timef", StringType), StructField("c_year", IntegerType),
      StructField("c_text", StringType), StructField("c_char", StringType),
      StructField("c_enum", IntegerType), StructField("c_set", IntegerType),
      StructField("c_bit", LongType)))
    val src = spark.readStream.format("graft-binlog")
      .option("host", "127.0.0.1").option("port", m.port)
      .option("user", "repl").option("password", Password)
      .option("columns",
        s"""{"shop.alltypes": [${allTypesCols.map("\"" + _ + "\"").mkString(",")}]}""")
      .load()
    val sink = new MultiTableSink(s"$root/{db}/ods_{db}_{table}",
      Seq(CdcTableSpec("shop", "alltypes", schema, Seq("c_tiny"), "c_bit")), 1)
    try {
      val q = sink.start(src, ckpt)
      try q.processAllAvailable() finally q.stop()
      val rows = spark.read.parquet(s"$root/shop/ods_shop_alltypes/data")
        .collect()
      assert(rows.length === 2)
      // the c_tiny=-5 row is written once (NOBLOB insert) and never
      // updated, so its decode is batch-boundary-independent: c_text
      // omitted on the wire -> absent in JSON -> null in the table, and
      // every column AFTER the omitted one still aligned
      val r1 = rows.find(_.getAs[Int]("c_tiny") == -5).get
      assert(r1.isNullAt(r1.fieldIndex("c_text")))
      assert(r1.getAs[Int]("c_short") === -1234)
      assert(r1.getAs[String]("c_char") === "abc")
      assert(r1.getAs[Int]("c_enum") === 2)
      assert(r1.getAs[Long]("c_bit") === 2748L)
      // the c_tiny=7 row additionally receives a MINIMAL update; whether
      // the insert or the update version wins depends on micro-batch
      // boundaries (within a batch the precombine tie-break keeps the
      // insert; across batches CDC last-writer-wins applies) — both are
      // legitimate, so only key presence is asserted here. The update's
      // exact partial payload (PK + changed + _omitted) is pinned
      // byte-for-byte in BinlogWireSpec.
      assert(rows.exists(_.getAs[Int]("c_tiny") == 7))
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
