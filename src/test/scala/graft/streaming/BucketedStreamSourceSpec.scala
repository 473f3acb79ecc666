package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.BucketedLake

/** `spark.readStream.format("graft-bucketed")` — streaming tail of a
  * bucketed lake table by MVCC version: typed rows, checkpointed
  * resume, admission control, compaction invisibility, loud refusal of
  * non-append commits, and the full exactly-once lake→lake composition
  * (tail + [[BucketedLake.streamInto]]'s transactional watermarks). */
class BucketedStreamSourceSpec extends SparkSuite {

  import spark.implicits._

  private val cat = "graft_bkt"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftBucketCatalog].getName)
  }

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString

  private def mkTable(): String = {
    val path = tmp("bkt-src")
    BucketedLake.write((1L to 50L).map(i => (i, i)).toDF("k", "v"),
      path, "k", 4) // v1 (replace — the stream must start AFTER it or
    path             // with ignoreChanges; appends below are v2+)
  }

  test("tailing emits appended rows exactly; compaction is invisible") {
    val path = mkTable()
    (51L to 70L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v2
    BucketedLake.compact(spark, path) // v3 — physical only
    (71L to 80L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v4
    val q = spark.readStream.format("graft-bucketed")
      .option("path", path).option("startingVersion", "2").load()
      .writeStream.format("memory").queryName("bkt_tail")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("bkt_tail").as[(Long, Long)].collect().sorted.toSeq
    assert(got === (51L to 80L).map(i => (i, i)))
  }

  test("a microbatch step over delta fragments never slurps the checkpoint") {
    // floor 1 forces delta commits; the stream's fast path must then
    // advance on the O(changed) fragments ALONE — proven by tearing the
    // v1 checkpoint: the fallback (resolve v & v-1, diff) would throw
    // on every step, the fragment path never touches it
    spark.conf.set("spark.graft.bucketed.manifestDeltaMinEntries", "1")
    try {
      val path = tmp("bkt-delta")
      BucketedLake.write((1L to 2000L).map(i => (i, i)).toDF("k", "v"),
        path, "k", 4) // v1 full checkpoint
      (2001L to 2010L).map(i => (i, i)).toDF("k", "v")
        .writeTo(s"$cat.`$path`").append() // v2 delta
      (2011L to 2020L).map(i => (i, i)).toDF("k", "v")
        .writeTo(s"$cat.`$path`").append() // v3 delta
      // tear the checkpoint: any resolve of v1/v2/v3 entry sets now
      // fails loudly — only the fragment-local diff can still stream
      val p1 = new org.apache.hadoop.fs.Path(path,
        BucketedLake.versionedManifest(1L))
      val fs = p1.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val torn = {
        val in = fs.open(p1)
        val buf = new java.io.ByteArrayOutputStream()
        try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
        finally in.close()
        new String(buf.toByteArray, "UTF-8").split("\n")
          .filterNot(_.startsWith("#end")).mkString("", "\n", "\n")
      }
      val out = fs.create(p1, true); out.write(torn.getBytes("UTF-8")); out.close()
      intercept[IllegalStateException](
        BucketedLake.readManifestFull(spark, path, Some(2L)))
      val q = spark.readStream.format("graft-bucketed")
        .option("path", path).option("startingVersion", "2").load()
        .writeStream.format("memory").queryName("bkt_deltafast")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("bkt_deltafast").as[(Long, Long)]
        .collect().sorted.toSeq
      assert(got === (2001L to 2020L).map(i => (i, i)),
        "delta-fragment steps must stream without resolving the chain")
    } finally
      spark.conf.unset("spark.graft.bucketed.manifestDeltaMinEntries")
  }

  test("restart resumes after the checkpointed version; startingVersion=latest sees only new commits") {
    val path = mkTable()
    (51L to 60L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v2
    val ckpt = Files.createTempDirectory("bkt-ckpt").toString
    val seen = mutable.ArrayBuffer.empty[Long]
    def run(): Unit = {
      val q = spark.readStream.format("graft-bucketed")
        .option("path", path).option("startingVersion", "2").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("k").as[Long].collect() }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.synchronized(seen.sorted.toSeq) === (51L to 60L))
    (61L to 65L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v3
    run()
    assert(seen.synchronized(seen.sorted.toSeq) === (51L to 65L),
      "v2 must not replay; v3 must arrive")
    // latest: a fresh tail sees nothing until a new commit lands
    val q2 = spark.readStream.format("graft-bucketed")
      .option("path", path).option("startingVersion", "latest").load()
      .writeStream.format("memory").queryName("bkt_latest")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("bkt_latest").count() === 0L)
  }

  test("admission control: maxFilesPerTrigger drains a backlog in bounded batches") {
    val path = mkTable()
    (1 to 5).foreach { g =>
      (g * 100L until g * 100L + 8L).map(i => (i, i)).toDF("k", "v")
        .writeTo(s"$cat.`$path`").append() // 4 files per append
    }
    val batches = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-bucketed")
      .option("path", path).option("startingVersion", "2")
      .option("maxFilesPerTrigger", "4").load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.synchronized { batches += b.count() }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.synchronized(batches.toSeq)
    assert(got.sum === 40L)
    assert(got.count(_ > 0L) >= 5,
      s"a 4-file budget must admit one 4-file version per batch: $got")
  }

  test("non-append commits fail loudly; ignoreChanges re-emits rewritten rows") {
    val path = mkTable()
    (51L to 60L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$path`").append() // v2
    BucketedLake.merge(spark, path, Seq((1L, 100L)).toDF("k", "v"),
      spark.emptyDataset[Long].toDF("k")): Unit // v3 — not append-only
    val q = spark.readStream.format("graft-bucketed")
      .option("path", path).option("startingVersion", "2").load()
      .writeStream.format("memory").queryName("bkt_refuse")
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
    // ignoreChanges: the merge version re-emits its rewritten files'
    // rows (k=1's whole bucket), deletes never surface
    val q2 = spark.readStream.format("graft-bucketed")
      .option("path", path).option("startingVersion", "3")
      .option("ignoreChanges", "true").load()
      .writeStream.format("memory").queryName("bkt_ignore")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.table("bkt_ignore").as[(Long, Long)].collect().toMap
    assert(rows(1L) === 100L, "the merged row must re-emit")
    assert(rows.nonEmpty)
  }

  test("typed-append IVM mart: streamAppendsInto folds the tail exactly-once") {
    val src = mkTable()
    (51L to 60L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$src`").append() // v2
    val viewPath = tmp("bkt-ivm")
    val ckpt = Files.createTempDirectory("bkt-ivm-ckpt").toString
    // group by the key's parity to keep the view tiny
    val vs = IncrementalAgg.ViewSpec(Seq("par"), sumCols = Seq("v"),
      buckets = 4)
    def run(): Unit = {
      val stream = spark.readStream.format("graft-bucketed")
        .option("path", src).option("startingVersion", "2").load()
      val q = IncrementalAgg.streamAppendsInto(stream, viewPath, vs, ckpt,
        transform = _.withColumn("par", col("k") % 2))
      try q.processAllAvailable() finally q.stop()
    }
    run()
    def view: Map[Long, (Long, Long)] =
      IncrementalAgg.read(spark, viewPath, vs)
        .select("par", "view_count", "sum_v")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    assert(view === Map(0L -> (5L, (52L to 60L by 2).sum),
      1L -> (5L, (51L to 59L by 2).sum)))
    // crash window on the IVM checkpoint: the epoch probe folds the
    // re-delivered batch to a no-op
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName)
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete())
    run()
    assert(view === Map(0L -> (5L, (52L to 60L by 2).sum),
      1L -> (5L, (51L to 59L by 2).sum)),
      "a re-delivered micro-batch must fold into a no-op")
    // new appends keep flowing
    (61L to 62L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$src`").append()
    run()
    assert(view(0L) === (6L, (52L to 62L by 2).sum))
    assert(view(1L) === (6L, (51L to 61L by 2).sum))
  }

  test("exactly-once lake->lake replication: tail + streamInto watermarks survive a crash-replay") {
    val src = mkTable()
    (51L to 60L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$src`").append() // v2
    val dst = tmp("bkt-dst")
    BucketedLake.createEmpty(spark, dst, "k", 4,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val ckpt = Files.createTempDirectory("bkt-mirror-ckpt").toString
    def mirror(): Unit = {
      val stream = spark.readStream.format("graft-bucketed")
        .option("path", src).option("startingVersion", "2").load()
      val q = BucketedLake.streamInto(stream, dst, "mirror-a", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    mirror()
    assert(spark.read.table(s"$cat.`$dst`").count() === 10L)
    // crash window: delete the sink checkpoint's newest commit so the
    // batch re-delivers — the destination's txn watermark folds it
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParentFile,
      s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) assert(crc.delete()) // the checksum sibling too
    mirror()
    assert(spark.read.table(s"$cat.`$dst`").count() === 10L,
      "a re-delivered micro-batch must fold into a no-op")
    // new data still flows after the replay
    (61L to 63L).map(i => (i, i)).toDF("k", "v")
      .writeTo(s"$cat.`$src`").append()
    mirror()
    assert(spark.read.table(s"$cat.`$dst`")
      .as[(Long, Long)].collect().sorted.toSeq ===
      ((51L to 63L).map(i => (i, i))))
  }
}
