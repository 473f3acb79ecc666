package graft.sources

import java.util.UUID

import graft.SparkSuite

/** [[DeletionVectors]] codec units: Z85 against the published test
  * vector, UUID round-trip, RoaringBitmapArray portable framing incl.
  * the >2³² high-bitmap split, and the DV file framing (offset seek,
  * size + CRC verification). */
class DeletionVectorsSpec extends SparkSuite {

  test("z85 encodes the spec's HelloWorld test vector") {
    // the Z85 reference vector (ZeroMQ RFC 32): these 8 bytes <-> "HelloWorld"
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeletionVectors.z85Encode(bytes) === "HelloWorld")
    assert(DeletionVectors.z85Decode("HelloWorld").toSeq === bytes.toSeq)
  }

  test("uuid z85 round-trips as the last-20-chars form") {
    val u = UUID.fromString("0a1b2c3d-4e5f-6071-8293-a4b5c6d7e8f9")
    val enc = DeletionVectors.encodeUuid(u)
    assert(enc.length === 20)
    assert(DeletionVectors.decodeUuid(enc) === u)
    // 'u' path resolution takes the LAST 20 chars; a prefix is a directory
    val d = DeletionVectors.Descriptor("u", "ab/" + enc, Some(1), 10, 1L)
    assert(DeletionVectors.filePath("/t", d).toString ===
      s"/t/ab/deletion_vector_$u.bin")
  }

  test("RoaringBitmapArray portable framing round-trips, incl. >2^32 rows") {
    val rows = Seq(0L, 5L, 1000000L, (1L << 32) + 7L, (3L << 32) + 1L)
    val data = DeletionVectors.serializeRows(rows)
    // magic, little-endian
    assert((data(0) & 0xff) === (1681511377 & 0xff))
    assert(DeletionVectors.deserializeRows(data).toSeq === rows.sorted)
    // empty
    assert(DeletionVectors.deserializeRows(
      DeletionVectors.serializeRows(Nil)).isEmpty)
    // garbage fails loudly
    val e = intercept[IllegalArgumentException](
      DeletionVectors.deserializeRows(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
    assert(e.getMessage.contains("magic"))
  }

  test("DV file framing: version byte, per-vector offset seek, CRC check") {
    val root = java.nio.file.Files.createTempDirectory("dvfile").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val dvs = Seq(Seq(1L, 3L, 5L), Seq(0L), Seq.empty[Long])
    val descriptors = DeletionVectors.writeFile(spark, root, dvs)
    assert(descriptors.map(_.cardinality) === Seq(3L, 1L, 0L))
    descriptors.zip(dvs).foreach { case (d, expected) =>
      assert(DeletionVectors.readRows(conf, root, d).toSeq === expected)
    }
    // corrupting a byte of the first vector's data breaks its CRC
    val p = DeletionVectors.filePath(root, descriptors.head)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p.toString))
    bytes(6) = (bytes(6) ^ 0x01).toByte // inside vector 0's data
    java.nio.file.Files.write(java.nio.file.Paths.get(p.toString), bytes)
    // remove Hadoop's local-FS .crc sidecar so OUR framing CRC is what
    // catches the corruption (on object stores there is no sidecar)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(p.getParent.toString, "." + p.getName + ".crc"))
    val e = intercept[IllegalArgumentException](
      DeletionVectors.readRows(conf, root, descriptors.head))
    assert(e.getMessage.contains("checksum") || e.getMessage.contains("magic"))
  }
}
