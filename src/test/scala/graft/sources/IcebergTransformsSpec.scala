package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sink.IcebergWrite

/** Iceberg HIDDEN PARTITIONING: the spec's partition transforms
  * ([[IcebergTransforms]], Appendix-B hash vectors), the
  * transform-routed write ([[IcebergWrite.writeHiddenPartitioned]]),
  * and data-predicate file pruning through [[TransformFileIndex]]. */
class IcebergTransformsSpec extends SparkSuite {

  import spark.implicits._

  test("Appendix-B murmur3 vectors and transform arithmetic") {
    // published test vectors (Iceberg spec, Appendix B): ints promote to
    // longs, strings hash their UTF-8 bytes, seed 0
    assert(IcebergTransforms.hashLong(34L) === 2017239379)
    assert(IcebergTransforms.hashString("iceberg") === 1210000089)
    assert(IcebergTransforms.bucketLong(34L, 16) ===
      (2017239379 & Int.MaxValue) % 16)
    // temporal transforms: floorDiv semantics (negatives round to −∞)
    val micros20171116 = java.time.LocalDateTime.parse("2017-11-16T22:31:08")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    assert(IcebergTransforms.dayFromMicros(micros20171116) === 17486)
    assert(IcebergTransforms.hourFromMicros(micros20171116) === 17486 * 24 + 22)
    assert(IcebergTransforms.monthFromMicros(micros20171116) ===
      (2017 - 1970) * 12 + 10)
    assert(IcebergTransforms.dayFromMicros(-1L) === -1,
      "a microsecond before the epoch is day -1, not day 0")
    assert(IcebergTransforms.truncateLong(-7L, 10L) === -10L)
    assert(IcebergTransforms.truncateLong(17L, 10L) === 10L)
    assert(IcebergTransforms.truncateString("iceberg", 3) === "ice")
  }

  test("inclusive projection keeps/prunes correctly") {
    import IcebergTransforms.{keeps, SpecField}
    import org.apache.spark.sql.types._
    val day = SpecField("ts_day", "day", "ts", TimestampType)
    val d100 = 100L * 86400L * 1000000L // first micro of day 100
    assert(keeps(day, 100, ">=", d100))
    assert(keeps(day, 100, ">=", d100 - 1L), "day 100 can hold ts >= last micro of day 99? no — but the predicate bound is in day 99, so day 100 still matches")
    assert(!keeps(day, 98, ">=", d100 - 1L))
    assert(keeps(day, 99, ">=", d100 - 1L))
    assert(!keeps(day, 101, "<", d100))
    assert(keeps(day, 100, "<", d100),
      "ts < first-micro-of-day-100 projects to day <= 100 (inclusive)")
    assert(keeps(day, 100, "=", d100 + 5L))
    assert(!keeps(day, 101, "=", d100 + 5L))
    assert(keeps(day, null, "=", d100), "null tuple value never prunes")
    val bucket = SpecField("id_bucket", "bucket[4]", "id", LongType)
    val b7 = IcebergTransforms.bucketLong(7L, 4)
    assert(keeps(bucket, b7, "=", 7L))
    assert(!keeps(bucket, (b7 + 1) % 4, "=", 7L))
    assert(keeps(bucket, (b7 + 1) % 4, ">=", 7L),
      "bucket is not monotone: range predicates never prune")
    assert(keeps(bucket, b7, "in", Seq[Any](7L, 9L)))
  }

  test("hidden-partitioned write + read: rows route, data predicates prune files") {
    val root = Files.createTempDirectory("iceberg-hidden").toString
    val rows = (0 until 40).map { i =>
      (i.toLong, new Timestamp(86400000L * (i % 4) + 1000L * i), i * 10L)
    }
    val df = rows.toDF("id", "ts", "v")
    val fields = Seq((1, "id", "long"), (2, "ts", "timestamptz"),
      (3, "v", "long"))
    assert(IcebergWrite.writeHiddenPartitioned(df, root,
      Seq(("ts_day", "day", "ts"), ("id_bucket", "bucket[4]", "id")),
      fields, snapshotId = 1L))
    // replay skipped
    assert(!IcebergWrite.writeHiddenPartitioned(df, root,
      Seq(("ts_day", "day", "ts"), ("id_bucket", "bucket[4]", "id")),
      fields, snapshotId = 1L))

    val snap = IcebergRead.snapshot(spark, root)
    assert(snap.columns.toSeq === Seq("id", "ts", "v"),
      "hidden partitioning: no partition column in the output")
    assert(snap.count() === 40L)
    assert(snap.selectExpr("sum(v)").as[Long].head ===
      rows.map(_._3).sum)

    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      } match {
        case Seq(one) => one
        case other => fail(s"expected ONE scan, got ${other.size}")
      }
    val totalFiles = scanOf(snap).selectedPartitions.totalNumberOfFiles

    // day pruning: ts >= day 2 keeps only days 2..3 — and stays correct
    val recent = snap.where($"ts" >= new Timestamp(2L * 86400000L))
    val recentScan = scanOf(recent)
    assert(recent.count() === rows.count(_._2.getTime >= 2L * 86400000L))
    assert(recentScan.selectedPartitions.totalNumberOfFiles < totalFiles,
      s"day predicate did not prune (read all $totalFiles files)")
    assert(recentScan.selectedPartitions.totalNumberOfFiles <=
      totalFiles / 2 + 1,
      "ts >= day 2 must drop roughly half the day-partitions")

    // bucket pruning: id = 7 keeps only bucket(7)'s files
    val one = snap.where($"id" === 7L)
    val oneScan = scanOf(one)
    assert(one.selectExpr("v").as[Long].collect().toSeq === Seq(70L))
    assert(oneScan.selectedPartitions.totalNumberOfFiles < totalFiles,
      "bucket equality did not prune")

    // unprojectable predicate: correct, no pruning surprises
    assert(snap.where($"v" > 350L).count() ===
      rows.count(_._3 > 350L))
  }

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    } match {
      case Seq(one) => one.selectedPartitions.totalNumberOfFiles
      case other => fail(s"expected ONE scan, got ${other.size}")
    }

  test("partition evolution day(ts) -> bucket(id): per-group pruning, one scan") {
    val root = Files.createTempDirectory("iceberg-evolve").toString
    val fields = Seq((1, "id", "long"), (2, "ts", "timestamptz"),
      (3, "v", "long"))
    def rows(lo: Int, hi: Int) = (lo until hi).map { i =>
      (i.toLong, new Timestamp(86400000L * (i % 4) + 1000L * i), i * 10L)
    }
    val old = rows(0, 20)
    assert(IcebergWrite.writeHiddenPartitioned(old.toDF("id", "ts", "v"),
      root, Seq(("ts_day", "day", "ts")), fields, snapshotId = 1L))
    val neu = rows(20, 40)
    assert(IcebergWrite.writeHiddenPartitioned(neu.toDF("id", "ts", "v"),
      root, Seq(("id_bucket", "bucket[4]", "id")), fields, snapshotId = 2L))
    // metadata-only evolution: BOTH specs retained, the new one default
    val meta = IcebergRead.readMetadata(spark, root)
    assert(meta.get("partition-specs").size() === 2)
    assert(meta.get("default-spec-id").asInt() === 1)
    // one scan over both eras
    val snap = IcebergRead.snapshot(spark, root)
    assert(snap.columns.toSeq === Seq("id", "ts", "v"))
    assert(snap.count() === 40L)
    val total = scanFiles(snap)
    // a ts predicate prunes the day-era group through ITS spec; the
    // bucket-era files (ts not in their spec) are all kept — correct
    val recent = snap.where($"ts" >= new Timestamp(2L * 86400000L))
    assert(recent.count() ===
      (old ++ neu).count(_._2.getTime >= 2L * 86400000L))
    assert(scanFiles(recent) < total, "day-era files did not prune")
    // an id equality prunes the bucket-era group; day-era files all kept
    val one = snap.where($"id" === 25L)
    assert(one.selectExpr("v").as[Long].collect().toSeq === Seq(250L))
    assert(scanFiles(one) < total, "bucket-era files did not prune")
    // writing with the CURRENT spec again must NOT evolve a third spec
    assert(IcebergWrite.writeHiddenPartitioned(
      Seq((99L, new Timestamp(86400000L), 990L)).toDF("id", "ts", "v"),
      root, Seq(("id_bucket", "bucket[4]", "id")), fields, snapshotId = 3L))
    val meta2 = IcebergRead.readMetadata(spark, root)
    assert(meta2.get("partition-specs").size() === 2,
      "an identical spec must carry forward, not append")
    assert(IcebergRead.snapshot(spark, root).count() === 41L)
  }

  test("partition evolution from an unpartitioned era: empty tuples never prune") {
    val root = Files.createTempDirectory("iceberg-evolve0")
    val fields = Seq((1, "id", "long"), (2, "ts", "timestamptz"),
      (3, "v", "long"))
    // snapshot 1: unpartitioned append (empty partition tuples)
    val tmp = Files.createTempDirectory("ice-unpart")
    Seq((100L, new Timestamp(0L), 1000L), (101L, new Timestamp(0L), 1010L))
      .toDF("id", "ts", "v").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val dataDir = root.resolve("data")
    Files.createDirectories(dataDir)
    val f0 = dataDir.resolve("unpart.parquet")
    Files.copy(part, f0)
    IcebergWrite.commitEntries(spark, root.toString,
      Seq(IcebergWrite.FileEntry(f0.toString, 0, 1L,
        sizeInBytes = Files.size(f0))),
      schemaFields = fields, snapshotId = 1L)
    // snapshot 2: the table EVOLVES to day(ts) partitioning
    val neu = (0 until 8).map { i =>
      (i.toLong, new Timestamp(86400000L * (i % 4)), i * 10L)
    }
    assert(IcebergWrite.writeHiddenPartitioned(neu.toDF("id", "ts", "v"),
      root.toString, Seq(("ts_day", "day", "ts")), fields, snapshotId = 2L))
    val snap = IcebergRead.snapshot(spark, root.toString)
    assert(snap.count() === 10L)
    val total = scanFiles(snap)
    // pruning on ts drops day-era files but ALWAYS keeps the
    // unpartitioned-era file — and the result is correct
    val recent = snap.where($"ts" >= new Timestamp(2L * 86400000L))
    assert(recent.selectExpr("sum(v)").as[Long].head ===
      neu.filter(_._2.getTime >= 2L * 86400000L).map(_._3).sum)
    assert(scanFiles(recent) < total)
    assert(snap.where($"v" >= 1000L).count() === 2L,
      "unpartitioned-era rows must survive every pruned scan")
  }

  test("iceberg_bucket SQL function matches the scan-side arithmetic") {
    graft.functions.IcebergPartitionFunctions.ensureRegistered(spark)
    val got = spark.sql(
      "SELECT iceberg_bucket(34L, 16), iceberg_bucket('iceberg', 16)")
      .as[(Int, Int)].head
    assert(got._1 === IcebergTransforms.bucketLong(34L, 16))
    assert(got._2 === IcebergTransforms.bucketString("iceberg", 16))
  }
}
