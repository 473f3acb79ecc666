package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}
import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** A local FS with fault injection: `open()` of an armed file name fails
  * with IOException a bounded number of times, then succeeds — the shape
  * of a TRANSIENT remote-store read failure. `flaky:///a/b` maps to the
  * local file `/a/b`, so a table written through `file://` can be
  * re-addressed through this scheme for a single faulty maintenance
  * pass. */
class FlakyLocalFs extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    if (FlakyLocalFs.shouldFail(f.getName))
      throw new java.io.IOException(s"injected transient read failure: $f")
    super.open(f, bufferSize)
  }
}

object FlakyLocalFs {
  private val armed = new ConcurrentHashMap[String, AtomicInteger]()
  def arm(name: String, times: Int): Unit =
    armed.put(name, new AtomicInteger(times)): Unit
  def shouldFail(name: String): Boolean =
    Option(armed.get(name)).exists(_.getAndDecrement() > 0)
  def reset(): Unit = armed.clear()
}

/** Robustness of the manifest layer's failure paths — the ADVICE-class
  * contracts: a transient IO failure during vacuum's chain-closure probe
  * must OVER-RETAIN (never doom a base manifest a retained delta still
  * resolves through); the lenient parse paths never throw on corrupt
  * header numerics (they report torn); a prelude probe ignores a line
  * cut at its 1 KiB buffer boundary instead of mis-parsing it. */
class ManifestRobustnessSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkrob"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
    spark.sparkContext.hadoopConfiguration.set(
      "fs.flaky.impl", classOf[FlakyLocalFs].getName)
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def fs(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")
  private def fragText(path: String, v: Long): String = {
    val p = new Path(path, BucketedLake.versionedManifest(v))
    val in = fs(path).open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
  private def rewriteFrag(path: String, v: Long, text: String): Unit = {
    val out = fs(path).create(
      new Path(path, BucketedLake.versionedManifest(v)), true)
    out.write(text.getBytes("UTF-8")); out.close()
  }
  private def withDeltas[A](body: => A): A =
    try {
      spark.conf.set("spark.graft.bucketed.manifestDeltaMinEntries", "1")
      body
    } finally
      spark.conf.unset("spark.graft.bucketed.manifestDeltaMinEntries")

  test("vacuum over-retains when a chain-closure prelude probe fails transiently") {
    withDeltas {
      val path = tmp("rob-vacuum")
      BucketedLake.write((1L to 2000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 2) // v1 full
      (1 to 3).foreach { i =>
        Seq((9000L + i, i.toLong)).toDF("k", "v")
          .writeTo(s"$cat.`$path`").append() // v2..v4 deltas
      }
      // Fail ONE prelude read of the mid-chain fragment v3, through a
      // flaky FS view of the SAME directory. Pre-fix, the failed probe
      // read as "full checkpoint", stopping the keep walk at v3 and
      // dooming v1/v2 — which v4 (current) still resolves through.
      FlakyLocalFs.reset()
      FlakyLocalFs.arm(BucketedLake.versionedManifest(3L), 1)
      try {
        val flakyPath = "flaky://" + path
        val rep = BucketedLake.vacuum(spark, flakyPath, minAgeMs = 0L)
        (1L to 4L).foreach { v =>
          assert(fs(path).exists(
            new Path(path, BucketedLake.versionedManifest(v))),
            s"fragment v$v must survive a vacuum whose probe failed " +
              s"(report: $rep)")
        }
        assert(rep.manifests === 0,
          "an incomplete keep-set must retain EVERY manifest this pass")
        assert(table(path).count() === 2003L,
          "the current version must stay readable after the faulty pass")
      } finally FlakyLocalFs.reset()
      // the next (healthy) pass behaves normally: chain closure keeps
      // the live chain, the table stays readable
      BucketedLake.vacuum(spark, path, minAgeMs = 0L): Unit
      assert(table(path).count() === 2003L)
    }
  }

  test("corrupt header numerics mark a fragment torn — lenient paths never throw") {
    val path = tmp("rob-numerics")
    BucketedLake.write((1L to 200L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    // corrupt the #layout bucket count (NumberFormatException bait)
    val corrupted = fragText(path, 1L).split("\n").map { l =>
      if (l.startsWith("#layout\t")) {
        val parts = l.split("\t"); parts(2) = "notanumber"
        parts.mkString("\t")
      } else l
    }.mkString("", "\n", "\n") + "#txn\tapp\tnotanepoch\n"
    rewriteFrag(path, 1L, corrupted)
    // fragments() is documented never-throws: it must REPORT, not raise
    val rows = spark.sql(
      s"SELECT * FROM graft_bucketed_fragments('$path')").collect()
    assert(rows.length === 1 && rows(0).getAs[Boolean]("truncated"),
      s"corrupt header numerics must report torn: ${rows.mkString}")
    // the lenient resolver reports None, never NumberFormatException
    assert(BucketedLake.resolveManifestLenient(fs(path), path, 1L).isEmpty)
    // the strict read path stays LOUD and names repair()
    val e = intercept[IllegalStateException](table(path).count())
    assert(e.getMessage.contains("repair"))
  }

  test("readPrelude ignores a header line cut at its 1 KiB buffer boundary") {
    val dir = tmp("rob-prelude")
    val f = fs(dir)
    f.mkdirs(new Path(dir))
    // Craft a fragment whose '#delta\t123' line straddles byte 1024:
    // pad with #op lines so the buffer cuts it to '#delta\t12'. A naive
    // parse would report base=12 — silently wrong for foreign-written
    // manifests whose prelude overflows the probe window.
    val head = "#graft\t2\n"
    // position the delta line so byte 1024 lands INSIDE its numeric
    // suffix: the probe buffer then ends with '#delta\t12345' — a naive
    // parse would report base=12345
    val deltaStart = 1024 - 12
    val filler = "#op\t" + "x" * (deltaStart - head.length - 5) + "\n"
    val pad = head + filler
    assert(pad.length === deltaStart)
    val deltaLine = "#delta\t123456789\n"
    val text = pad + deltaLine + "#chain\t4\n#end\t0\n"
    val p = new Path(dir, BucketedLake.versionedManifest(9L))
    val out = f.create(p, true); out.write(text.getBytes("UTF-8")); out.close()
    val (_, base) = BucketedLake.readPrelude(f, p)
    assert(base.isEmpty,
      s"a boundary-cut '#delta' line must be ignored, got base=$base")
    // a SHORT file (fully covered by the probe) parses its final line
    val p2 = new Path(dir, BucketedLake.versionedManifest(10L))
    val out2 = f.create(p2, true)
    out2.write("#graft\t2\n#chain\t2\n#delta\t123\n".getBytes("UTF-8"))
    out2.close()
    val (chain2, base2) = BucketedLake.readPrelude(f, p2)
    assert(chain2 === 2 && base2.contains(123L))
  }
}
