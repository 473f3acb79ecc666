package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** W2 against a REAL Hive metastore: the same CatalogSync.sync DDL+MSCK
  * path run on an `enableHiveSupport`-style session backed by the embedded
  * Derby metastore (the in-sandbox stand-in for the reference's external
  * thrift metastore — HiveExternalCatalog speaks the identical metastore
  * API either way; only the connection transport differs).
  *
  * The assertions interrogate `sharedState.externalCatalog` (the
  * Derby-backed Hive catalog, NOT the session's in-memory view) and a
  * fresh `newSession()` — proof the table and its discovered partitions
  * were persisted in the metastore rather than registered session-locally. */
class HiveSyncSpec extends AnyFunSuite {

  test("sync creates + MSCK-repairs a partitioned table in an embedded Hive metastore") {
    val base = graft.SparkSuite.session // boot the shared context first
    val sc = base.sparkContext
    val tmp = Files.createTempDirectory("graft-hive").toString
    val hadoopConf = sc.hadoopConfiguration
    val prevJdo = Option(hadoopConf.get("javax.jdo.option.ConnectionURL"))
    // a NEW SparkSession on the existing context builds its own SharedState,
    // which applies the session's static SQL confs (catalogImplementation)
    // over a clone of the context conf; the metastore JDBC URL travels via
    // the hadoop conf
    hadoopConf.set("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=$tmp/metastore_db;create=true")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val hive = SparkSession.builder()
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
        .getOrCreate()
      assert(hive ne base)
      assert(hive.sharedState.externalCatalog.unwrapped.getClass.getSimpleName
        === "HiveExternalCatalog")
      import hive.implicits._

      val t = LakeTable(s"$tmp/table", "evts", Seq("id"), "ver",
        partitionFields = Seq("dt"))
      MergeWriter.append(Seq(
        (1L, "a", 1L, "2024-01-01"), (2L, "b", 1L, "2024-01-01"),
        (3L, "c", 1L, "2024-01-02"), (4L, "d", 1L, "2024-01-03"))
        .toDF("id", "v", "ver", "dt"), t)

      CatalogSync.sync(hive, "gdb", "gtable", t)

      // metastore-backed: the EXTERNAL catalog lists the table and the
      // partitions MSCK discovered from the directory layout
      val cat = hive.sharedState.externalCatalog
      assert(cat.tableExists("gdb", "gtable"))
      val parts = cat.listPartitions("gdb", "gtable")
      assert(parts.map(_.spec("dt")).toSet
        === Set("2024-01-01", "2024-01-02", "2024-01-03"))

      // a fresh session over the same metastore resolves it through SQL
      val fresh = hive.newSession()
      assert(fresh.sql("SELECT count(*) FROM gdb.gtable").as[Long].head() === 4L)
      assert(fresh.sql(
        "SELECT id FROM gdb.gtable WHERE dt = '2024-01-02'").as[Long].head() === 3L)

      // non-partitioned DDL path registers too
      val flat = LakeTable(s"$tmp/flat", "flat", Seq("id"), "ver")
      MergeWriter.append(Seq((9L, "z", 1L)).toDF("id", "v", "ver"), flat)
      CatalogSync.sync(hive, "gdb", "gflat", flat)
      assert(cat.tableExists("gdb", "gflat"))
      assert(fresh.sql("SELECT count(*) FROM gdb.gflat").as[Long].head() === 1L)
    } finally {
      // restore the shared in-memory-catalog session for the other suites
      prevJdo match {
        case Some(v) => hadoopConf.set("javax.jdo.option.ConnectionURL", v)
        case None => hadoopConf.unset("javax.jdo.option.ConnectionURL")
      }
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
