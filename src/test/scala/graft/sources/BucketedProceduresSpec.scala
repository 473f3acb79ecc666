package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `CALL cat.system.<proc>(...)` — the SQL spelling of the bucketed
  * lake's table services ([[BucketedProcedures]] via Spark 4's
  * ProcedureCatalog): each maintenance op runs from pure SQL and
  * returns a one-row report. */
class BucketedProceduresSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkp"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString

  test("CALL compact folds appended files and reports the committed version") {
    val path = tmp("bkp-compact")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4)
    (101L to 200L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    val before = BucketedLake.readManifestFull(spark, path).get.entries.length
    assert(before > 4)
    val r = spark.sql(s"CALL $cat.system.compact('$path')").head()
    assert(r.getLong(0) === 3L) // write=1, append=2, compact=3
    assert(r.getInt(1) === 4)   // folded to one file per bucket
    assert(spark.read.table(s"$cat.`$path`").count() === 200L)
  }

  test("CALL cluster splits groups into bounded z-ordered files") {
    val path = tmp("bkp-cluster")
    BucketedLake.write(
      (1L to 4000L).map(i => (i, ((i * 2654435761L) % 4000L).toInt))
        .toDF("k", "v"), path, "k", 2)
    val r = spark.sql(
      s"CALL $cat.system.cluster('$path', 'v', 500)").head()
    assert(r.getLong(0) === 2L)
    assert(r.getInt(1) > 2, "expected split files")
    assert(spark.read.table(s"$cat.`$path`").count() === 4000L)
  }

  test("CALL build_bloom_index commits a header; CALL vacuum dry-run reports without deleting") {
    val path = tmp("bkp-bloom")
    BucketedLake.write(
      (1L to 1000L).map(i => (i, f"uid-$i%05d")).toDF("k", "uid"),
      path, "k", 2)
    val r = spark.sql(
      s"CALL $cat.system.build_bloom_index('$path', 'uid')").head()
    assert(r.getLong(0) === 2L)
    assert(r.getString(1).startsWith("_index/bloom/"))
    assert(BucketedLake.readManifestFull(spark, path).get.bloom
      .contains(r.getString(1)))
    // supersede v1's files, then dry-run vs real vacuum parity
    BucketedLake.compact(spark, path): Unit
    spark.sql(s"CALL $cat.system.cluster('$path', 'k', 100)").collect()
    val dry = spark.sql(
      s"CALL $cat.system.vacuum('$path', 0, true)").head()
    val real = spark.sql(
      s"CALL $cat.system.vacuum('$path', 0, false)").head()
    assert(dry.getInt(0) === real.getInt(0) &&
      dry.getLong(1) === real.getLong(1),
      s"dry-run must equal the real pass: $dry vs $real")
    assert(real.getInt(0) > 0, "superseded files should be reclaimed")
    assert(spark.read.table(s"$cat.`$path`").count() === 1000L)
  }

  test("CALL repair restores a lost/corrupt pointer to the last complete commit") {
    val path = tmp("bkp-repair")
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    (101L to 200L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new org.apache.hadoop.fs.Path(path, "_bucket_manifest.current")
    // corrupt the pointer: scans fail LOUDLY, never guess from listings
    val out = fs.create(ptr, true)
    try out.write("garbage".getBytes) finally out.close()
    val e = intercept[Exception](
      spark.read.table(s"$cat.`$path`").count())
    assert(e.getMessage.contains("pointer") ||
      Option(e.getCause).exists(_.getMessage.contains("pointer")))
    assert(spark.sql(s"CALL $cat.system.repair('$path')")
      .head().getLong(0) === 2L)
    assert(spark.read.table(s"$cat.`$path`").count() === 200L)
    // a DELETED pointer repairs too; a crashed half-commit is
    // reachable again only if its manifest fully landed (it did here)
    fs.delete(ptr, false): Unit
    assert(BucketedLake.repair(spark, path) === 2L)
    assert(spark.read.table(s"$cat.`$path`").count() === 200L)
    // no versioned manifests at all -> loud refusal, never a listing
    val bare = tmp("bkp-repair-bare")
    BucketedLake.write((1L to 5L).map(i => (i, i)).toDF("k", "v"),
      bare, "k", 2)
    fs.listStatus(new org.apache.hadoop.fs.Path(bare))
      .filter(_.getPath.getName.startsWith("_bucket_manifest"))
      .foreach(st => fs.delete(st.getPath, false))
    val e2 = intercept[IllegalArgumentException](
      BucketedLake.repair(spark, bare))
    assert(e2.getMessage.contains("rewrite the table"))
  }

  test("SHOW PROCEDURES lists the maintenance surface; unknown CALL fails loudly") {
    val listed = spark.sql(s"SHOW PROCEDURES IN $cat.system").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|"))
    BucketedProcedures.names.foreach(n =>
      assert(listed.exists(_.contains(n)), s"$n missing from $listed"))
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.nope('/x')").collect())
    assert(e.getMessage.toLowerCase.contains("nope"))
  }
}
