package graft.sink

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSuite
import graft.sources.{DeletionVectors, IcebergRead, Puffin}

/** Iceberg format-v3 DELETION VECTORS: [[IcebergWrite.deleteWhereDv]]
  * writes `deletion-vector-v1` blobs in real puffin sidecars, the
  * manifests carry `referenced_data_file`/`content_offset`/
  * `content_size_in_bytes`, the metadata flips to `format-version: 3`,
  * and [[IcebergRead]] merges the vectors back out of the scan. */
class IcebergDvSpec extends SparkSuite {

  import spark.implicits._

  private val fields = Seq((1, "id", "long"), (2, "item", "string"))

  private def rows(root: String): Seq[(Long, String)] =
    IcebergRead.snapshot(spark, root)
      .as[(Long, String)].collect().toSeq.sorted

  test("deleteWhereDv deletes rows via puffin DV blobs; v3 metadata; replay-safe") {
    val root = Files.createTempDirectory("iceberg-dv").toString
    IcebergWrite.upsert(
      (1L to 10L).map(i => (i, s"item-$i")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    assert(IcebergWrite.deleteWhereDv(spark, root, "id % 2 = 0",
      snapshotId = 2L, sequenceNumber = 2L))
    assert(rows(root) === (1L to 10L by 2).map(i => (i, s"item-$i")))
    // metadata is format-version 3 now
    val meta = IcebergRead.readMetadata(spark, root)
    assert(meta.get("format-version").asInt() === 3)
    // replayed snapshot id: skipped before writing anything
    assert(!IcebergWrite.deleteWhereDv(spark, root, "id = 1",
      snapshotId = 2L, sequenceNumber = 2L))
    assert(rows(root) === (1L to 10L by 2).map(i => (i, s"item-$i")))
    // a SECOND DV delete accumulates with the first (per-file union)
    assert(IcebergWrite.deleteWhereDv(spark, root, "id % 3 = 0",
      snapshotId = 3L, sequenceNumber = 3L))
    assert(rows(root) ===
      Seq(1L, 5L, 7L).map(i => (i, s"item-$i")))
    // time travel below the second delete still sees the first state
    assert(IcebergRead.snapshot(spark, root, snapshotId = Some(2L))
      .as[(Long, String)].collect().toSeq.sorted ===
      (1L to 10L by 2).map(i => (i, s"item-$i")))
  }

  test("puffin container bytes are spec-shaped and blob-addressable") {
    val root = Files.createTempDirectory("iceberg-dv-bytes").toString
    IcebergWrite.upsert(
      (1L to 6L).map(i => (i, s"w$i")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    assert(IcebergWrite.deleteWhereDv(spark, root, "id >= 5",
      snapshotId = 2L, sequenceNumber = 2L))
    val conf = spark.sparkContext.hadoopConfiguration
    val dataDir = new Path(root, "data")
    val fs = dataDir.getFileSystem(conf)
    val puffins = fs.listStatus(dataDir)
      .map(_.getPath).filter(_.getName.endsWith(".puffin"))
    assert(puffins.length >= 1)
    val blobs = puffins.toSeq.flatMap(p =>
      Puffin.blobMetadata(conf, p.toString).map(p.toString -> _))
    assert(blobs.map(_._2._1).distinct === Seq("deletion-vector-v1"))
    // footer offsets address the SAME positions the manifest read uses,
    // and the blob payload round-trips through the CRC check
    val all = blobs.flatMap { case (path, (_, ref, off, len, card)) =>
      val ps = Puffin.readDv(conf, path, off, len)
      assert(ps.length.toLong === card)
      assert(ref.nonEmpty)
      ps
    }
    assert(all.nonEmpty)
    // corrupting a vector byte trips the CRC, loudly
    val victim = puffins.head
    val bytes = {
      val in = fs.open(victim)
      val size = fs.getFileStatus(victim).getLen.toInt
      val buf = new Array[Byte](size)
      try in.readFully(0, buf) finally in.close()
      buf
    }
    bytes(9) = (bytes(9) ^ 0x7f).toByte // inside the first blob's vector
    val out = fs.create(victim, true)
    try out.write(bytes) finally out.close()
    val (_, _, off, len, _) =
      blobs.find(_._1 == victim.toString).get._2
    val err = intercept[Exception](
      Puffin.readDv(conf, victim.toString, off, len))
    assert(err.getMessage.contains("CRC") ||
      err.getMessage.contains("magic"))
  }

  test("DV blob framing is byte-compatible with Delta's DV serialization") {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = Files.createTempDirectory("puffin-frame").toString
    val p = new Path(dir, "t.puffin")
    val positions = Seq(0L, 3L, 7L, (1L << 32) + 5L) // spans two high words
    val blob = Puffin.writeDvFile(conf, p,
      Seq("f1.parquet" -> positions), snapshotId = 9L,
      sequenceNumber = 9L).head
    assert(blob.cardinality === positions.size.toLong)
    // the blob minus its [len][crc] framing IS a portable
    // RoaringBitmapArray — Delta's deserializer reads it verbatim
    val fs = p.getFileSystem(conf)
    val buf = new Array[Byte](blob.length.toInt)
    val in = fs.open(p)
    try in.readFully(blob.offset, buf) finally in.close()
    val vlen = java.nio.ByteBuffer.wrap(buf).getInt
    assert(vlen === blob.length.toInt - 8)
    val vector = buf.slice(4, 4 + vlen)
    assert(DeletionVectors.deserializeRows(vector).toSeq === positions)
    // and the magic bytes open the vector: D1 D3 39 64
    assert(vector.take(4).toSeq ===
      Seq(0xD1, 0xD3, 0x39, 0x64).map(_.toByte))
  }

  test("v2 position deletes and v3 DVs compose on one table") {
    val root = Files.createTempDirectory("iceberg-dv-mixed").toString
    IcebergWrite.upsert(
      (1L to 8L).map(i => (i, s"x$i")).toDF("id", "item"),
      root, Seq("id"), fields, snapshotId = 1L, sequenceNumber = 1L)
    assert(IcebergWrite.deleteWhere(spark, root, "id IN (1, 2)",
      snapshotId = 2L, sequenceNumber = 2L))
    assert(IcebergWrite.deleteWhereDv(spark, root, "id IN (7, 8)",
      snapshotId = 3L, sequenceNumber = 3L))
    assert(rows(root) === (3L to 6L).map(i => (i, s"x$i")))
  }
}
