package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental manifest DELTAS + full checkpoints — the scalability
  * layer that keeps a commit's metadata write O(changed files) instead
  * of a full rewrite of a manifest that may list 10^5-10^6 entries.
  * Contracts: delta fragments resolve to exactly the full set a
  * non-delta write would have produced (every read path, every
  * retained version); the checkpoint interval bounds chain depth;
  * truncation anywhere in a chain is LOUD on reads, walks repair()
  * below the break, and makes vacuum over-retain; vacuum never
  * reclaims a fragment a retained version's chain passes through. */
class ManifestDeltaSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkd"
  private val MinEntriesKey = "spark.graft.bucketed.manifestDeltaMinEntries"
  private val CheckpointKey = "spark.graft.bucketed.manifestCheckpointEvery"

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
    val p = new Path(path, BucketedLake.versionedManifest(v))
    val in = fs(path).open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
  private def fragSize(path: String, v: Long): Long =
    fs(path).getFileStatus(
      new Path(path, BucketedLake.versionedManifest(v))).getLen

  private def withDeltas[A](minEntries: Int = 1,
                            checkpointEvery: Int = 16)(body: => A): A =
    try {
      spark.conf.set(MinEntriesKey, minEntries.toString)
      spark.conf.set(CheckpointKey, checkpointEvery.toString)
      body
    } finally {
      spark.conf.unset(MinEntriesKey)
      spark.conf.unset(CheckpointKey)
    }

  test("an append writes a delta fragment that resolves to the full set") {
    withDeltas() {
      val path = tmp("bkd-basic")
      val df = (1L to 4000L).map(i => (i, i * 2)).toDF("k", "v")
      BucketedLake.write(df, path, "k", 4) // v1: full checkpoint
      Seq((9001L, 1L), (9002L, 2L)).toDF("k", "v")
        .writeTo(s"$cat.`$path`").append() // v2: delta
      val t2 = fragText(path, 2L)
      assert(t2.contains("#delta\t1"), s"v2 must be a delta fragment:\n$t2")
      assert(t2.contains("#chain\t1"))
      assert(t2.contains("#rmend\t0") && t2.contains("#end\t"))
      // resolution: entries = v1's ∪ the appended files, bucket-sorted
      val m1 = BucketedLake.readManifestFull(spark, path, Some(1L)).get
      val m2 = BucketedLake.readManifestFull(spark, path, Some(2L)).get
      assert(m2.entries.size > m1.entries.size)
      assert(m1.entries.toSet.subsetOf(m2.entries.toSet),
        "an append's resolution must carry every prior entry verbatim")
      assert(m2.entries == m2.entries.sortBy(e => (e.bucket, e.rel)),
        "resolution must be shape-identical to a full write (sorted)")
      // end-to-end: reads, time travel, row counts
      assert(table(path).count() === 4002L)
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft_bucketed('$path', 1)").head.getLong(0)
        === 4000L)
      // headers are fragment-whole: the delta carries layout/op/sorted
      assert(m2.op.contains("append") && m2.layout.isDefined)
    }
  }

  test("commit bytes are O(changed): a 1-file append's delta is tiny vs the checkpoint") {
    withDeltas() {
      val path = tmp("bkd-bytes")
      // ~64 files: maxRowsPerFile splits each bucket
      BucketedLake.write((1L to 8000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 8, maxRowsPerFile = Some(32L))
      val fullBytes = fragSize(path, 1L)
      Seq((9001L, 1L)).toDF("k", "v").writeTo(s"$cat.`$path`").append()
      val deltaBytes = fragSize(path, 2L)
      assert(deltaBytes * 5 < fullBytes,
        s"delta ($deltaBytes B) must be far smaller than the " +
          s"checkpoint ($fullBytes B)")
      assert(table(path).count() === 8001L)
    }
  }

  test("the checkpoint interval bounds chain depth; metadata deletes ride #rm lines") {
    withDeltas(checkpointEvery = 3) {
      val path = tmp("bkd-chain")
      val df = (1L to 1000L).map(i => (i, s"d${i % 10}", i))
        .toDF("k", "dt", "v")
      BucketedLake.write(df, path, "k", 2, partitionCols = Seq("dt")) // v1
      (1 to 4).foreach { i =>
        Seq((9000L + i, "d0", i.toLong)).toDF("k", "dt", "v")
          .writeTo(s"$cat.`$path`").append() // v2..v5
      }
      // chains: v1 full(0), v2..v4 deltas(1..3), v5 full again (depth cap)
      assert(fragText(path, 2L).contains("#chain\t1"))
      assert(fragText(path, 4L).contains("#chain\t3"))
      val t5 = fragText(path, 5L)
      assert(!t5.contains("#delta\t") && t5.contains("#chain\t0"),
        s"the commit after a full-depth chain must checkpoint:\n${t5.take(200)}")
      // a metadata DELETE atop the checkpoint is a removes-only delta
      spark.sql(s"DELETE FROM $cat.`$path` WHERE dt = 'd0'")
      val t6 = fragText(path, 6L)
      assert(t6.contains("#delta\t5") && t6.contains("#rm\t"),
        s"partition delete should commit as #rm lines:\n${t6.take(300)}")
      assert(!t6.split("\n").exists(l => !l.startsWith("#")),
        "a pure delete delta must carry no entry lines")
      assert(table(path).where(col("dt") === "d0").count() === 0L)
      assert(table(path).count() ===
        df.where(col("dt") =!= "d0").count())
      // every retained version still time-travels
      (1L to 6L).foreach { v =>
        assert(spark.sql(
          s"SELECT COUNT(*) FROM graft_bucketed('$path', $v)")
          .head.getLong(0) >= 0L)
      }
    }
  }

  test("a torn delta is LOUD; repair walks below the break; vacuum over-retains") {
    withDeltas() {
      val path = tmp("bkd-torn")
      BucketedLake.write((1L to 2000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 2) // v1
      Seq((9001L, 1L)).toDF("k", "v").writeTo(s"$cat.`$path`").append() // v2
      val before = table(path).count()
      // tear v2: drop its #end terminator (what a crash mid-write leaves)
      val full = fragText(path, 2L)
      val torn = full.split("\n").filterNot(_.startsWith("#end"))
        .mkString("", "\n", "\n")
      val p2 = new Path(path, BucketedLake.versionedManifest(2L))
      val out = fs(path).create(p2, true)
      out.write(torn.getBytes("UTF-8")); out.close()
      val e = intercept[IllegalStateException](table(path).count())
      assert(e.getMessage.contains("repair"),
        s"a torn fragment must fail loudly naming repair(): ${e.getMessage}")
      // vacuum with the torn fragment retained: data deletion disabled
      val rep = BucketedLake.vacuum(spark, path, minAgeMs = 60000L)
      assert(rep.files === 0, "over-retain, never over-delete")
      // repair walks DOWN past the torn delta to the complete checkpoint
      assert(BucketedLake.repair(spark, path) === 1L)
      assert(table(path).count() === before - 1L)
    }
  }

  test("a torn fragment MID-CHAIN poisons every version above it (repair finds the floor)") {
    withDeltas() {
      val path = tmp("bkd-midchain")
      BucketedLake.write((1L to 2000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 2) // v1 full
      Seq((9001L, 1L)).toDF("k", "v").writeTo(s"$cat.`$path`").append() // v2
      Seq((9002L, 2L)).toDF("k", "v").writeTo(s"$cat.`$path`").append() // v3
      assert(fragText(path, 3L).contains("#delta\t2"))
      // tear v2 (the middle link): v3 is complete but UNRESOLVABLE
      val torn = fragText(path, 2L).split("\n")
        .filterNot(_.startsWith("#end")).mkString("", "\n", "\n")
      val p2 = new Path(path, BucketedLake.versionedManifest(2L))
      val out = fs(path).create(p2, true)
      out.write(torn.getBytes("UTF-8")); out.close()
      intercept[IllegalStateException](
        BucketedLake.readManifestFull(spark, path, Some(3L)))
      assert(BucketedLake.repair(spark, path) === 1L,
        "repair must bless only a version whose WHOLE chain resolves")
    }
  }

  test("vacuum keeps the chain closure: aged fragments a live delta needs survive") {
    withDeltas() {
      val path = tmp("bkd-closure")
      BucketedLake.write((1L to 2000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 2) // v1 full
      (1 to 3).foreach { i =>
        Seq((9000L + i, i.toLong)).toDF("k", "v")
          .writeTo(s"$cat.`$path`").append() // v2..v4 deltas
      }
      val rep = BucketedLake.vacuum(spark, path, minAgeMs = 0L)
      // v4 (current) chains through v3, v2, v1: NONE may be reclaimed
      (1L to 4L).foreach { v =>
        assert(fs(path).exists(
          new Path(path, BucketedLake.versionedManifest(v))),
          s"fragment v$v is in the live chain and must survive vacuum " +
            s"(report: $rep)")
      }
      assert(table(path).count() === 2003L,
        "the current version must stay readable after vacuum")
      // a fresh checkpoint frees the old chain for the NEXT pass
      BucketedLake.compact(spark, path) // v5 (folds appends; full diff)
      BucketedLake.vacuum(spark, path, minAgeMs = 0L): Unit
      assert(!fs(path).exists(
        new Path(path, BucketedLake.versionedManifest(1L))),
        "once no retained chain needs it, the old checkpoint reclaims")
      assert(table(path).count() === 2003L)
      // CDF across the new checkpoint still renders
      assert(BucketedLake.changes(spark, path, 5L, 5L).count() >= 0L)
    }
  }

  test("maintenance headers ride tiny deltas; every reader resolves them") {
    withDeltas() {
      val path = tmp("bkd-headers")
      BucketedLake.write((1L to 4000L).map(i => (i, f"u$i%05d"))
        .toDF("k", "uid"), path, "k", 4)
      BucketedLake.analyzeNdv(spark, path): Unit // v2: header-only
      val t2 = fragText(path, 2L)
      assert(t2.contains("#delta\t1") && t2.contains("#ndv\t"))
      // header-only = the delta carries NO entry/remove lines (the HLL
      // header itself is KBs — at real scale the entry list dwarfs it)
      assert(!t2.split("\n").exists(l => l.nonEmpty && !l.startsWith("#")),
        "a header-only commit must not rewrite the entry list")
      assert(t2.contains("#rmend\t0") && t2.contains("#end\t0"))
      BucketedLake.buildBloomIndex(spark, path, Seq("uid")) // v3
      assert(fragText(path, 3L).contains("#bloom\t"))
      // history/files/stats views resolve through the chain
      val hist = BucketedLake.history(spark, path).collect()
      assert(hist.length === 3)
      assert(hist.map(_.getLong(3)).distinct.length === 1,
        "row counts are identical across header-only versions")
      assert(BucketedLake.files(spark, path).count() === 4L)
      assert(table(path).where(col("uid") === "u00007").count() === 1L)
    }
  }

  test("graft_bucketed_fragments: full/delta kinds, chains, resolved counts, torn-chain health") {
    withDeltas() {
      val path = tmp("bkd-fragments")
      BucketedLake.write((1L to 2000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 2) // v1 full
      Seq((9001L, 1L)).toDF("k", "v").writeTo(s"$cat.`$path`").append() // v2
      Seq((9002L, 2L)).toDF("k", "v").writeTo(s"$cat.`$path`").append() // v3
      val rows = spark.sql(
        s"SELECT * FROM graft_bucketed_fragments('$path') ORDER BY version")
        .collect()
      assert(rows.length === 3)
      assert(rows(0).getAs[String]("kind") === "full" &&
        rows(0).getAs[Int]("chain") === 0)
      assert(rows(1).getAs[String]("kind") === "delta" &&
        rows(1).getAs[Long]("base") === 1L &&
        rows(1).getAs[Int]("chain") === 1)
      assert(rows(2).getAs[Int]("chain") === 2)
      // resolved live counts grow by one appended file per commit
      val live = rows.map(_.getAs[Long]("live_files"))
      assert(live(1) === live(0) + 1 && live(2) === live(1) + 1)
      // the delta carries only the changed lines (size itself is
      // header-dominated at this tiny fixture — the O(changed)-bytes
      // contract is pinned at 250 files above and 100k in ScaleProbe)
      assert(rows(1).getAs[Long]("adds") === 1L &&
        rows(1).getAs[Long]("removes") === 0L)
      assert(rows(0).getAs[Long]("adds") === rows(0).getAs[Long]("live_files"))
      assert(rows.forall(!_.getAs[Boolean]("truncated")))
      // tear the middle link: v2 reports truncated, v3's resolution nulls
      val torn = fragText(path, 2L).split("\n")
        .filterNot(_.startsWith("#end")).mkString("", "\n", "\n")
      val out = fs(path).create(
        new Path(path, BucketedLake.versionedManifest(2L)), true)
      out.write(torn.getBytes("UTF-8")); out.close()
      val after = spark.sql(
        s"SELECT * FROM graft_bucketed_fragments('$path') ORDER BY version")
        .collect()
      assert(after(1).getAs[Boolean]("truncated"))
      assert(after(1).isNullAt(after(1).fieldIndex("live_files")))
      assert(after(2).isNullAt(after(2).fieldIndex("live_files")),
        "a delta atop a torn base must report unresolvable, not a number")
    }
  }

  test("below the entry floor every commit stays a full manifest (default behavior unchanged)") {
    val path = tmp("bkd-floor") // default confs: floor 1024
    BucketedLake.write((1L to 100L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 2)
    Seq((9001L, 1L)).toDF("k", "v").writeTo(s"$cat.`$path`").append()
    val t2 = fragText(path, 2L)
    assert(!t2.contains("#delta\t"),
      s"small tables keep full manifests:\n${t2.take(200)}")
    assert(table(path).count() === 101L)
  }
}
