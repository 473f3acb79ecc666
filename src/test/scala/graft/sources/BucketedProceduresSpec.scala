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

  test("manifest truncation is LOUD: scans refuse, repair walks down, vacuum over-retains") {
    val path = tmp("bkp-trunc")
    val hPath = new org.apache.hadoop.fs.Path(path)
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    (101L to 200L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append()
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifestPath(v: Long) = new org.apache.hadoop.fs.Path(path,
      f"_bucket_manifest.v$v%06d.txt")
    // crash mid-manifest-write: the line-independent records mean a
    // byte-truncated file PARSES cleanly with silently fewer entries —
    // only the #end terminator betrays it
    val full = {
      val in = fs.open(manifestPath(2L))
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
        buf.toByteArray
      } finally in.close()
    }
    assert(new String(full, "UTF-8").startsWith("#graft\t2"))
    assert(new String(full, "UTF-8").contains("#end\t"))
    val out = fs.create(manifestPath(2L), true)
    try out.write(full, 0, (full.length * 3) / 5) finally out.close()
    // 1) an ordinary scan of the truncated pointer-referenced manifest
    //    fails LOUDLY — never a silent partial file set
    val e = intercept[Exception](
      spark.read.table(s"$cat.`$path`").count())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("truncated manifest")), msgs(e))
    // 2) repair() must NOT bless the truncated v2 (it parses!) — it
    //    walks down to v1, the highest COMPLETE commit
    assert(BucketedLake.repair(spark, path) === 1L)
    assert(spark.read.table(s"$cat.`$path`").count() === 100L)
    assert(spark.read.table(s"$cat.`$path`").agg(max($"k")).head()
      .getLong(0) === 100L, "v1's exact rows, none of v2's")
    // 3) vacuum with the truncated ABOVE-pointer manifest retained:
    //    over-retain — zero data files reclaimed even though v1-only
    //    retention would normally allow superseded reclaim
    val old = System.currentTimeMillis() - 10L * 24 * 3600 * 1000
    BucketedLake.listDataFilesFor(spark, path).foreach { f =>
      fs.setTimes(new org.apache.hadoop.fs.Path(f._3), old, old) }
    fs.setTimes(manifestPath(1L), old, old)
    // keep the truncated v2 YOUNG so retention keeps it in the pass
    val rep = BucketedLake.vacuum(spark, path, minAgeMs = 60000L)
    assert(rep.files === 0,
      s"over-retain: a truncated retained manifest must disable " +
        s"data-file deletion, got $rep")
    assert(fs.exists(manifestPath(2L)), "young truncated manifest kept")
    assert(spark.read.table(s"$cat.`$path`").count() === 100L)
    // 4) once every manifest on disk is truncated, repair refuses
    val all = tmp("bkp-trunc-all")
    BucketedLake.write((1L to 10L).map(i => (i, i)).toDF("k", "v"),
      all, "k", 2)
    val af = new org.apache.hadoop.fs.Path(all).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ap = new org.apache.hadoop.fs.Path(all, "_bucket_manifest.v000001.txt")
    val abytes = {
      val in = af.open(ap)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
        buf.toByteArray
      } finally in.close()
    }
    val aout = af.create(ap, true)
    try aout.write(abytes, 0, abytes.length / 2) finally aout.close()
    val e2 = intercept[IllegalStateException](BucketedLake.repair(spark, all))
    assert(e2.getMessage.contains("truncated"))
  }
}
