package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Parquet-bodied manifest CHECKPOINTS — the 10^6-file half of the
  * incremental-manifest design: delta fragments already made commits
  * O(changed); above the entry floor the periodic FULL checkpoint now
  * writes its entry list as a snappy parquet sidecar
  * (`_manifest/ckpt-v<N>-*.parquet`) named by a `#pq` header, instead
  * of megabytes of text lines. Contracts: resolution is transparent
  * (every read path sees the same entries a text checkpoint would
  * carry); framing stays LOUD (a missing/short body reads as torn —
  * strict paths name repair(), lenient paths over-retain); deltas and
  * small tables stay all-text; vacuum retains bodies referenced by
  * retained fragments and reclaims superseded/orphaned ones. */
class ParquetCheckpointSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkpq"
  private val FloorKey = "spark.graft.bucketed.manifestParquetMinEntries"
  private val MinEntriesKey = "spark.graft.bucketed.manifestDeltaMinEntries"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftBucketCatalog].getName)
    graft.functions.LakeTableFunctions.ensureRegistered(spark)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString
  private def table(path: String): DataFrame =
    spark.read.table(s"$cat.`$path`")
  private def fs(path: String) = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def fragText(path: String, v: Long): String = {
    val in = fs(path).open(new Path(path, BucketedLake.versionedManifest(v)))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
  private def withFloor[A](floor: Int, deltaMin: Int = 1)(body: => A): A =
    try {
      spark.conf.set(FloorKey, floor.toString)
      spark.conf.set(MinEntriesKey, deltaMin.toString)
      body
    } finally { spark.conf.unset(FloorKey); spark.conf.unset(MinEntriesKey) }

  private def ckptRels(path: String): Seq[String] = {
    val root = new Path(path, "_manifest")
    if (!fs(path).exists(root)) Nil
    else fs(path).listStatus(root).map(_.getPath.getName).toSeq.sorted
  }

  test("above the floor a checkpoint is parquet-bodied and resolves transparently") {
    withFloor(4) {
      val path = tmp("bkpq-basic")
      val df = (1L to 4000L).map(i => (i, i * 2)).toDF("k", "v")
      BucketedLake.write(df, path, "k", 8) // v1: parquet checkpoint
      val t1 = fragText(path, 1L)
      assert(t1.contains("#pq\t_manifest/ckpt-v1-") && t1.contains("#end\t0"),
        s"checkpoint must carry a #pq body pointer:\n${t1.take(300)}")
      assert(!t1.split("\n").exists(l => l.nonEmpty && !l.startsWith("#")),
        "no inline entry lines next to a #pq body")
      assert(ckptRels(path).size === 1)
      // resolution: entries match the files on disk, stats included
      val m = BucketedLake.readManifestFull(spark, path).get
      assert(m.entries.size === 8)
      assert(m.entries.forall(_.stats.isDefined),
        "stats JSON must survive the parquet round trip")
      assert(m.entries === m.entries.sortBy(e => (e.bucket, e.rel)),
        "resolution must be shape-identical to a text checkpoint")
      assert(table(path).count() === 4000L)
      // a filtered scan still prunes off the round-tripped stats
      assert(table(path).where(col("k") === 77L).count() === 1L)
      // an append atop the parquet checkpoint is a TEXT delta
      Seq((9001L, 1L)).toDF("k", "v").writeTo(s"$cat.`$path`").append()
      val t2 = fragText(path, 2L)
      assert(t2.contains("#delta\t1") && !t2.contains("#pq\t"))
      assert(table(path).count() === 4001L)
      // the fragments view reports the body format and its TRUE bytes
      val frags = spark.sql(
        s"SELECT * FROM graft_bucketed_fragments('$path') ORDER BY version")
        .collect()
      assert(frags(0).getAs[String]("body") === "parquet")
      assert(frags(1).getAs[String]("body") === "text")
      val ckptBytes = fs(path).getFileStatus(
        new Path(path, s"_manifest/${ckptRels(path).head}")).getLen
      assert(frags(0).getAs[Long]("bytes") > ckptBytes,
        "checkpoint bytes must include the parquet body")
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft_bucketed('$path', 1)").head.getLong(0)
        === 4000L)
    }
  }

  test("below the floor everything stays text (default format unchanged)") {
    withFloor(1000000) {
      val path = tmp("bkpq-floor")
      BucketedLake.write((1L to 500L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 4)
      assert(!fragText(path, 1L).contains("#pq\t"))
      assert(ckptRels(path).isEmpty)
      assert(table(path).count() === 500L)
    }
  }

  test("a missing checkpoint body is LOUD: strict reads name repair, lenient over-retain") {
    withFloor(4) {
      val path = tmp("bkpq-torn")
      BucketedLake.write((1L to 1000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 4) // v1 parquet ckpt
      Seq((9001L, 1L)).toDF("k", "v").writeTo(s"$cat.`$path`").append() // v2
      val body = ckptRels(path).head
      fs(path).delete(new Path(path, s"_manifest/$body"), false)
      val e = intercept[IllegalStateException](table(path).count())
      assert(e.getMessage.contains("repair"),
        s"a missing body must fail loudly naming repair(): ${e.getMessage}")
      // fragments() reports, never throws; both fragments unresolvable
      // (v2 is a delta atop the torn checkpoint)
      val rows = spark.sql(
        s"SELECT * FROM graft_bucketed_fragments('$path') ORDER BY version")
        .collect()
      assert(rows(0).getAs[Boolean]("truncated"))
      assert(rows(1).isNullAt(rows(1).fieldIndex("live_files")))
      // vacuum over-retains: incomplete referenced-set deletes nothing
      val rep = BucketedLake.vacuum(spark, path, minAgeMs = 60000L)
      assert(rep.files === 0)
    }
  }

  test("inline entry lines next to a #pq pointer read as corrupt") {
    withFloor(4) {
      val path = tmp("bkpq-mixed")
      BucketedLake.write((1L to 1000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 4)
      val mixed = fragText(path, 1L).split("\n").flatMap {
        case l if l.startsWith("#end") =>
          Seq("0\t5\t100\tdata/__bucket=0/bogus.parquet", l)
        case l => Seq(l)
      }.mkString("", "\n", "\n")
      val out = fs(path).create(
        new Path(path, BucketedLake.versionedManifest(1L)), true)
      out.write(mixed.getBytes("UTF-8")); out.close()
      intercept[IllegalStateException](table(path).count())
    }
  }

  test("vacuum keeps referenced checkpoint bodies, reclaims superseded and orphaned ones") {
    withFloor(4) {
      val path = tmp("bkpq-vacuum")
      BucketedLake.write((1L to 2000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 4) // v1 ckpt A
      (1 to 2).foreach { i =>
        Seq((9000L + i, i.toLong)).toDF("k", "v")
          .writeTo(s"$cat.`$path`").append() // v2, v3 text deltas
      }
      BucketedLake.compact(spark, path) // v4: fresh parquet ckpt B
      assert(ckptRels(path).size === 2)
      // an orphan from a lost OCC race: unreferenced by any fragment
      val orphan = new Path(path, "_manifest/ckpt-v99-orphan.parquet")
      val o = fs(path).create(orphan, true); o.write(1); o.close()
      val rep = BucketedLake.vacuum(spark, path, minAgeMs = 0L)
      assert(rep.manifests >= 2,
        s"old fragments + ckpt A + orphan must reclaim: $rep")
      val left = ckptRels(path)
      assert(left.size === 1 && left.head.startsWith("ckpt-v4-"),
        s"only the referenced body survives: $left")
      assert(!fs(path).exists(orphan))
      assert(table(path).count() === 2002L,
        "the current version must stay readable after vacuum")
      // time travel to the surviving version still resolves
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft_bucketed('$path', 4)").head.getLong(0)
        === 2002L)
    }
  }
}
