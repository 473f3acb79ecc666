package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Puffin — Iceberg's sidecar-blob container (public puffin-spec), here
  * carrying format-v3 DELETION VECTORS (`deletion-vector-v1` blobs).
  *
  * File layout (Puffin v1):
  * {{{
  *   Magic  Blob₁ … Blobₙ  Magic FooterPayload FooterPayloadSize Flags Magic
  * }}}
  * where `Magic` is the 4 bytes `PFA1`, `FooterPayload` is the UTF-8
  * JSON `FileMetadata` (uncompressed here — flags = 0), and
  * `FooterPayloadSize` is a 4-byte little-endian int.
  *
  * A `deletion-vector-v1` blob is byte-compatible with Delta's DV
  * framing (the formats deliberately share it):
  * {{{
  *   len   : 4 bytes big-endian = |magic + vector|
  *   magic : D1 D3 39 64  (little-endian int 1681511377)
  *   vector: 64-bit RoaringBitmapArray, portable serialization
  *   crc   : 4 bytes big-endian CRC-32 of (magic + vector)
  * }}}
  * so [[DeletionVectors.serializeRows]] / `deserializeRows` — whose
  * output STARTS with that magic — are reused verbatim; only the
  * container and the manifest plumbing (`referenced_data_file`,
  * `content_offset`, `content_size_in_bytes`) are new.
  *
  * Scale note: a blob is one data file's deleted positions — the same
  * per-file unit of work as [[DeletionVectors.writeFilesDistributed]],
  * so writers shard puffin files per data file on EXECUTORS and the
  * driver only ever sees blob descriptors (offset/length/cardinality),
  * never row positions. */
object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte) // PFA1

  /** One written blob: where it landed and what it covers. */
  final case class DvBlob(referencedDataFile: String, offset: Long,
                          length: Long, cardinality: Long)

  /** Write one puffin file holding one `deletion-vector-v1` blob per
    * `(referenced data file → sorted deleted positions)` entry. Returns
    * the blob descriptors in input order. Safe to call executor-side
    * (plain hadoop `Configuration`, no SparkSession). */
  def writeDvFile(conf: Configuration, path: Path,
                  dvs: Seq[(String, Seq[Long])],
                  snapshotId: Long, sequenceNumber: Long): Seq[DvBlob] = {
    require(dvs.nonEmpty, "puffin DV file needs at least one blob")
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, false)
    val blobs = scala.collection.mutable.ArrayBuffer.empty[DvBlob]
    try {
      out.write(Magic)
      var offset = Magic.length.toLong
      dvs.foreach { case (refFile, rows) =>
        val vector = DeletionVectors.serializeRows(rows) // magic + vector
        val crc = new CRC32()
        crc.update(vector)
        out.writeInt(vector.length)      // BE on DataOutputStream
        out.write(vector)
        out.writeInt(crc.getValue.toInt) // BE
        val len = 4L + vector.length + 4L
        blobs += DvBlob(refFile, offset, len, rows.size.toLong)
        offset += len
      }
      val payload = footerJson(blobs.toSeq, snapshotId, sequenceNumber)
        .getBytes(UTF_8)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: payload uncompressed
      out.write(tail.array)
      out.write(Magic)
    } finally out.close()
    blobs.toSeq
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def footerJson(blobs: Seq[DvBlob], snapshotId: Long,
                         sequenceNumber: Long): String = {
    val items = blobs.map { b =>
      s"""{"type":"deletion-vector-v1","fields":[],""" +
        s""""snapshot-id":$snapshotId,"sequence-number":$sequenceNumber,""" +
        s""""offset":${b.offset},"length":${b.length},""" +
        s""""properties":{"referenced-data-file":"${jsonEscape(b.referencedDataFile)}",""" +
        s""""cardinality":"${b.cardinality}"}}"""
    }.mkString(",")
    s"""{"blobs":[$items],"properties":{"created-by":"graft"}}"""
  }

  /** Read one DV blob at `(offset, length)` back to its deleted row
    * positions, verifying the length prefix, the roaring magic, and the
    * CRC — a truncated or corrupt vector fails loudly instead of
    * silently resurrecting deleted rows. Executor-safe. */
  def readDv(conf: Configuration, path: String, offset: Long,
             length: Long): Array[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    require(length >= 12 && length <= Int.MaxValue,
      s"implausible DV blob length $length in $path")
    val buf = new Array[Byte](length.toInt)
    val in = fs.open(p)
    try in.readFully(offset, buf) finally in.close()
    val bb = ByteBuffer.wrap(buf) // big-endian framing
    val vlen = bb.getInt
    require(vlen == length - 8,
      s"DV blob length prefix $vlen does not match blob size $length in $path")
    val vector = new Array[Byte](vlen)
    bb.get(vector)
    val crc = new CRC32()
    crc.update(vector)
    val stored = bb.getInt
    require(stored == crc.getValue.toInt,
      s"DV blob CRC mismatch in $path @ $offset")
    DeletionVectors.deserializeRows(vector)
  }

  /** Parse a puffin file's footer to its blob metadata —
    * `(type, referenced-data-file, offset, length, cardinality)` rows.
    * Verifies all three magics. Driver-side (spec/TVF tooling). */
  def blobMetadata(conf: Configuration, path: String)
      : Seq[(String, String, Long, Long, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val size = fs.getFileStatus(p).getLen
    require(size >= 4 + 4 + 8 + 4, s"file too small for puffin: $path")
    val in = fs.open(p)
    try {
      val head = new Array[Byte](4)
      in.readFully(0, head)
      require(head.sameElements(Magic), s"not a puffin file (head magic): $path")
      val tail = new Array[Byte](12)
      in.readFully(size - 12, tail)
      require(tail.drop(8).sameElements(Magic),
        s"not a puffin file (tail magic): $path")
      val bb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt
      val flags = bb.getInt
      require((flags & 1) == 0, s"compressed puffin footer unsupported: $path")
      val payloadStart = size - 12 - payloadSize
      val payload = new Array[Byte](payloadSize)
      in.readFully(payloadStart, payload)
      val mid = new Array[Byte](4)
      in.readFully(payloadStart - 4, mid)
      require(mid.sameElements(Magic), s"puffin footer start magic missing: $path")
      val node = DocPushdown.jsonMapper.readTree(new String(payload, UTF_8))
      import scala.jdk.CollectionConverters._
      Option(node.get("blobs")).toSeq.flatMap(_.elements().asScala).map { b =>
        val props = Option(b.get("properties"))
        (b.get("type").asText(),
          props.flatMap(pr => Option(pr.get("referenced-data-file")))
            .map(_.asText()).getOrElse(""),
          b.get("offset").asLong(), b.get("length").asLong(),
          props.flatMap(pr => Option(pr.get("cardinality")))
            .map(_.asText().toLong).getOrElse(-1L))
      }.toSeq
    } finally in.close()
  }
}
