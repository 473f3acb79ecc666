package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** The Apache Hudi merge-on-read LOG FILE format (`HoodieLogFormat`,
  * version 1), from the published Hudi sources — this is what sits next
  * to the base parquet of a MOR file group as
  * `.{fileId}_{baseInstant}.log.{version}_{writeToken}`:
  *
  * Each block (hudi-common `HoodieLogFormatWriter.appendBlocks` /
  * `HoodieLogFileReader.readBlock`):
  * {{{
  *   MAGIC              6 bytes "#HUDI#"
  *   block length       int64  (bytes from the version field through the
  *                              trailing total-length field, inclusive)
  *   format version     int32  (1)
  *   block type         int32  (HoodieLogBlockType ordinal: 0=command,
  *                              1=delete, 2=corrupt, 3=avro data,
  *                              4=hfile, 5=parquet, 6=cdc)
  *   header             int32 count, then per entry:
  *                        int32 HeaderMetadataType ordinal
  *                        (0=INSTANT_TIME, 1=TARGET_INSTANT_TIME,
  *                         2=SCHEMA, 3=COMMAND_BLOCK_TYPE, …)
  *                        int32 length + UTF-8 bytes
  *   content length     int64
  *   content            bytes
  *   footer             same map layout as header (usually empty)
  *   total block length int64  (including MAGIC — enables reverse scans)
  * }}}
  *
  * Avro data block content (`HoodieAvroDataBlock`, content version 3):
  * {{{
  *   int32 content version (3)
  *   int32 record count
  *   per record: int32 length + Avro binary of the schema in the
  *               SCHEMA header entry
  * }}}
  *
  * Command blocks (rollback markers) carry TARGET_INSTANT_TIME: every
  * earlier block of that instant must be ignored by readers. Delete
  * blocks are recognized but fail loudly (their payload changed
  * serialization across Hudi versions; guessing would corrupt data).
  */
object HudiLogFormat {

  val Magic: Array[Byte] = "#HUDI#".getBytes(UTF_8)
  val FormatVersion = 1

  // HoodieLogBlockType ordinals
  val TypeCommand = 0
  val TypeDelete = 1
  val TypeCorrupt = 2
  val TypeAvroData = 3

  // HeaderMetadataType ordinals
  val HeaderInstantTime = 0
  val HeaderTargetInstantTime = 1
  val HeaderSchema = 2
  val HeaderCommandBlockType = 3

  final case class LogBlock(blockType: Int, header: Map[Int, String],
                            content: Array[Byte])

  /** Log file name → (fileId, baseInstant, logVersion, writeToken).
    * Pattern: `.{fileId}_{baseInstant}.log.{version}_{writeToken}` —
    * writeToken is `attempt-task-stage`-ish and optional in older
    * layouts. */
  private val LogFileRe = """\.([^_/]+)_(\d+)\.log\.(\d+)(?:_(.+))?""".r

  def parseLogFileName(name: String): Option[(String, String, Int, String)] =
    name match {
      case LogFileRe(fileId, baseInstant, version, token) =>
        Some((fileId, baseInstant, version.toInt, Option(token).getOrElse("")))
      case _ => None
    }

  // ----------------------------------------------------------------------
  // reading
  // ----------------------------------------------------------------------

  /** Parse every block of one log file. Trailing partial blocks (writer
    * died mid-append) terminate the scan silently, matching Hudi's
    * corrupt-block tolerance; structural corruption mid-file fails
    * loudly. */
  def readBlocks(in: InputStream): Seq[LogBlock] = {
    val d = new DataInputStream(in)
    val out = ArrayBuffer.empty[LogBlock]
    var eof = false
    while (!eof) {
      val magic = new Array[Byte](6)
      var read = 0
      try {
        while (read < 6) {
          val n = d.read(magic, read, 6 - read)
          if (n < 0) { eof = true; read = 6 } else read += n
        }
      } catch { case _: EOFException => eof = true }
      if (!eof) {
        if (!java.util.Arrays.equals(magic, Magic))
          throw new IllegalStateException(
            "bad Hudi log block magic — not a HoodieLogFormat file")
        try {
          d.readLong() // block length (redundant with the field lengths)
          val version = d.readInt()
          require(version <= FormatVersion, s"unsupported log format version $version")
          val blockType = d.readInt()
          val header = readMetaMap(d)
          val contentLen = d.readLong()
          require(contentLen >= 0 && contentLen < (8L << 30),
            s"implausible log block content length $contentLen")
          val content = new Array[Byte](contentLen.toInt)
          d.readFully(content)
          val _footer = readMetaMap(d)
          d.readLong() // total block length
          out += LogBlock(blockType, header, content)
        } catch {
          case _: EOFException => eof = true // partial trailing block
        }
      }
    }
    out.toSeq
  }

  private def readMetaMap(d: DataInputStream): Map[Int, String] = {
    val n = d.readInt()
    require(n >= 0 && n <= 64, s"implausible log metadata entry count $n")
    (0 until n).map { _ =>
      val key = d.readInt()
      val len = d.readInt()
      val bytes = new Array[Byte](len)
      d.readFully(bytes)
      key -> new String(bytes, UTF_8)
    }.toMap
  }

  /** Decode an Avro data block's records with its embedded SCHEMA. */
  def avroRecords(block: LogBlock): Seq[GenericRecord] = {
    require(block.blockType == TypeAvroData,
      s"not an Avro data block (type ${block.blockType})")
    val schemaJson = block.header.getOrElse(HeaderSchema,
      throw new IllegalStateException("Avro data block without SCHEMA header"))
    val schema = new Schema.Parser().parse(schemaJson)
    val d = new DataInputStream(new ByteArrayInputStream(block.content))
    val contentVersion = d.readInt()
    require(contentVersion >= 1 && contentVersion <= 3,
      s"unsupported Avro data block content version $contentVersion")
    val count = d.readInt()
    val reader = new GenericDatumReader[GenericRecord](schema)
    (0 until count).map { _ =>
      val len = d.readInt()
      val bytes = new Array[Byte](len)
      d.readFully(bytes)
      reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))
    }
  }

  /** Apply rollback command blocks: drop every block whose INSTANT_TIME
    * is the TARGET_INSTANT_TIME of a later command block, and the command
    * blocks themselves. */
  def effectiveBlocks(blocks: Seq[LogBlock]): Seq[LogBlock] = {
    val rolledBack = blocks.collect {
      case b if b.blockType == TypeCommand =>
        b.header.getOrElse(HeaderTargetInstantTime, "")
    }.filter(_.nonEmpty).toSet
    blocks.filter { b =>
      b.blockType != TypeCommand && b.blockType != TypeCorrupt &&
        !rolledBack.contains(b.header.getOrElse(HeaderInstantTime, ""))
    }
  }

  // ----------------------------------------------------------------------
  // writing (interop round-trip + fixtures)
  // ----------------------------------------------------------------------

  /** Serialize one block in the exact on-disk layout. */
  def writeBlock(out: DataOutputStream, block: LogBlock): Unit = {
    val headerBytes = metaMapBytes(block.header)
    val footerBytes = metaMapBytes(Map.empty)
    // version(4) + type(4) + header + contentLen(8) + content + footer +
    // trailing total-length(8)
    val blockLength = 4L + 4 + headerBytes.length + 8 + block.content.length +
      footerBytes.length + 8
    val total = 6L + 8 + blockLength
    out.write(Magic)
    out.writeLong(blockLength)
    out.writeInt(FormatVersion)
    out.writeInt(block.blockType)
    out.write(headerBytes)
    out.writeLong(block.content.length.toLong)
    out.write(block.content)
    out.write(footerBytes)
    out.writeLong(total)
  }

  private def metaMapBytes(m: Map[Int, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val bytes = v.getBytes(UTF_8)
      d.writeInt(k); d.writeInt(bytes.length); d.write(bytes)
    }
    d.flush()
    bos.toByteArray
  }

  /** Encode records as an Avro data block (content version 3). */
  def avroDataBlock(instantTime: String, schema: Schema,
                    records: Seq[GenericRecord]): LogBlock = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeInt(3) // content version
    d.writeInt(records.size)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    records.foreach { r =>
      val rb = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(rb, null)
      writer.write(r, enc)
      enc.flush()
      val bytes = rb.toByteArray
      d.writeInt(bytes.length); d.write(bytes)
    }
    d.flush()
    LogBlock(TypeAvroData,
      Map(HeaderInstantTime -> instantTime, HeaderSchema -> schema.toString),
      bos.toByteArray)
  }
}
