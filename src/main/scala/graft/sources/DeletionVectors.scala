package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID
import java.util.zip.CRC32

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.roaringbitmap.RoaringBitmap

/** Delta Lake DELETION VECTORS — the published on-disk format (Delta
  * PROTOCOL.md "Deletion Vectors"):
  *
  *  - a descriptor on the `add` action: `storageType` `u` (table-relative
  *    file named by a Z85-encoded UUID), `i` (inline in the log), or `p`
  *    (absolute path); `pathOrInlineDv`; `offset`; `sizeInBytes`;
  *    `cardinality`.
  *  - DV files: 1-byte format version (1), then each vector at its
  *    `offset` as `[int32 BE dataSize][data][int32 BE CRC-32(data)]`.
  *  - the data is a 64-bit RoaringBitmapArray in its "portable" framing:
  *    `int32 LE magic 1681511377`, `int64 LE bitmap count`, then each
  *    32-bit Roaring bitmap (standard RoaringFormatSpec portable
  *    serialization, little-endian) keyed 0,1,2,… by the row index's high
  *    32 bits. The 32-bit bitmaps are decoded by `org.roaringbitmap`
  *    from Spark's own classpath.
  *  - Z85 (ZeroMQ base85): 4 bytes → 5 chars, big-endian group value in
  *    base 85 over the fixed 85-char alphabet; a UUID is its 16 big-endian
  *    bytes → 20 chars, forming the LAST 20 chars of a `u` path (any
  *    leading chars are a directory prefix under the table root).
  *
  * Both directions are implemented (read for [[DeltaRead]], write for
  * [[graft.sink.DeltaWrite]] round-trips), from scratch, from the spec. */
object DeletionVectors {

  /** `add.deletionVector` descriptor (field names per the protocol). */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Option[Int], sizeInBytes: Int,
                              cardinality: Long)

  /** The spelling Spark's `_metadata.file_path` uses for `p`: the path's
    * URI rendering (percent-encoded) but WITHOUT the empty-authority
    * triple slash `Path.toUri` produces for local qualified paths —
    * empirically `file:/tmp/a%20b/f.parquet`, authority kept when real
    * (`hdfs://nn/...`), scheme absent for unqualified paths. */
  def sparkPathString(p: Path): String = {
    val u = p.toUri
    val auth = Option(u.getAuthority).filter(_.nonEmpty).orNull
    new java.net.URI(u.getScheme, auth, u.getPath, null, null).toString
  }

  // ---- Z85 ----------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode `bytes` (length must be a multiple of 4). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 needs 4n bytes, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85Alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  /** Z85-decode `s` (length must be a multiple of 5). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 needs 5n chars, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 0
      while (k < 4) { out(i / 5 * 4 + k) = ((v >>> (8 * (3 - k))) & 0xff).toByte; k += 1 }
      i += 5
    }
    out
  }

  /** Z85 over arbitrary-length data: zero-padded to 4n on encode (the
    * decoder truncates by the descriptor's `sizeInBytes` — exactly how
    * Delta's own base85 codec handles inline DVs). */
  def z85EncodePadded(bytes: Array[Byte]): String = {
    val pad = (4 - bytes.length % 4) % 4
    z85Encode(if (pad == 0) bytes else bytes ++ Array.fill(pad)(0.toByte))
  }

  def encodeUuid(u: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(bb.array)
  }

  def decodeUuid(s: String): UUID = {
    val bb = ByteBuffer.wrap(z85Decode(s))
    new UUID(bb.getLong, bb.getLong)
  }

  // ---- RoaringBitmapArray (portable) --------------------------------

  private val PortableMagic = 1681511377

  /** Serialize sorted distinct row indexes as a portable
    * RoaringBitmapArray. */
  def serializeRows(rows: Seq[Long]): Array[Byte] = {
    require(rows.forall(_ >= 0), "row indexes must be non-negative")
    val byHigh = rows.groupBy(r => (r >>> 32).toInt)
    val maxHigh = byHigh.keys.maxOption.getOrElse(-1)
    val bitmaps = (0 to maxHigh).map { h =>
      val bm = new RoaringBitmap()
      byHigh.getOrElse(h, Nil).foreach(r => bm.add(r.toInt))
      bm.runOptimize()
      bm
    }
    val size = 4 + 8 + bitmaps.map(_.serializedSizeInBytes().toLong).sum
    val bb = ByteBuffer.allocate(size.toInt).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(PortableMagic)
    bb.putLong(bitmaps.size.toLong)
    bitmaps.foreach(_.serialize(bb))
    bb.array
  }

  /** Expand a portable RoaringBitmapArray to its row indexes. */
  def deserializeRows(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == PortableMagic,
      s"not a portable RoaringBitmapArray (magic $magic, want $PortableMagic)")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"bitmap count $n out of range")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var h = 0
    while (h < n) {
      val bm = new RoaringBitmap()
      bm.deserialize(bb)
      // deserialize(ByteBuffer) does NOT advance the buffer position
      bb.position(bb.position() + bm.serializedSizeInBytes())
      val high = h.toLong << 32
      val it = bm.getIntIterator
      while (it.hasNext) out += high | (it.next() & 0xffffffffL)
      h += 1
    }
    out.toArray
  }

  // ---- DV file framing ----------------------------------------------

  /** Write one DV file containing `dvs` (rows per vector, in order) under
    * `table` with a fresh UUID name; returns the descriptors (storageType
    * `u`, no prefix) aligned with the input. */
  def writeFile(spark: SparkSession, table: String,
                dvs: Seq[Seq[Long]]): Seq[Descriptor] = {
    val uuid = UUID.randomUUID()
    val path = new Path(table, s"deletion_vector_$uuid.bin")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, false)
    val descriptors = scala.collection.mutable.ArrayBuffer.empty[Descriptor]
    try {
      out.writeByte(1) // format version
      var offset = 1
      dvs.foreach { rows =>
        val data = serializeRows(rows)
        val crc = new CRC32()
        crc.update(data)
        out.writeInt(data.length)
        out.write(data)
        out.writeInt(crc.getValue.toInt)
        descriptors += Descriptor("u", encodeUuid(uuid), Some(offset),
          data.length, rows.size.toLong)
        offset += 4 + data.length + 4
      }
    } finally out.close()
    descriptors.toSeq
  }

  /** Write one DV file PER (data file → deleted positions) group,
    * DISTRIBUTED: `filePos` is a `(__qualified, __pos)` frame; each
    * executor task serializes and writes the DV files for its groups
    * (one `u`-type file per data file), and the driver sees only the
    * `(data file, Descriptor)` list — bounded by the affected FILE
    * count, never by deleted-ROW count. The per-file position set
    * materializes in ONE task (exactly Delta's own DV writer shape: a
    * file's bitmap is the unit of work), deduplicated and sorted by the
    * aggregate, so a 100 TB table's delete never funnels row positions
    * through the driver. */
  def writeFilesDistributed(spark: SparkSession, table: String,
                            filePos: DataFrame): Seq[(String, Descriptor)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val props = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray)
    filePos
      .groupBy(col("__qualified"))
      .agg(sort_array(collect_set(col("__pos"))).as("__ps"))
      .as[(String, Seq[Long])]
      .rdd.mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        props.value.foreach { case (k, v) => conf.set(k, v) }
        it.map { case (file, ps) =>
          val uuid = UUID.randomUUID()
          val path = new Path(table, s"deletion_vector_$uuid.bin")
          val fs = path.getFileSystem(conf)
          val data = serializeRows(ps)
          val crc = new CRC32()
          crc.update(data)
          val out = fs.create(path, false)
          try {
            out.writeByte(1) // format version
            out.writeInt(data.length)
            out.write(data)
            out.writeInt(crc.getValue.toInt)
          } finally out.close()
          (file, encodeUuid(uuid), data.length, ps.size.toLong)
        }
      }
      .collect()
      .sortBy(_._1)
      .map { case (f, pid, size, card) =>
        f -> Descriptor("u", pid, Some(1), size, card)
      }
      .toSeq
  }

  /** Resolve a `u`/`p` descriptor to its DV file path. */
  def filePath(table: String, d: Descriptor): Path = d.storageType match {
    case "p" => new Path(d.pathOrInlineDv)
    case "u" =>
      val s = d.pathOrInlineDv
      require(s.length >= 20, s"u-type pathOrInlineDv too short: $s")
      val (prefix, encoded) = s.splitAt(s.length - 20)
      val name = s"deletion_vector_${decodeUuid(encoded)}.bin"
      if (prefix.isEmpty) new Path(table, name)
      else new Path(new Path(table, prefix), name)
    case other => throw new IllegalArgumentException(
      s"unknown deletion-vector storageType '$other'")
  }

  /** Read + expand one descriptor's row indexes (driver or executor; the
    * Hadoop conf is passed explicitly so executors can rebuild it). */
  def readRows(conf: org.apache.hadoop.conf.Configuration, table: String,
               d: Descriptor): Array[Long] = d.storageType match {
    case "i" => deserializeRows(
      z85Decode(d.pathOrInlineDv).take(d.sizeInBytes))
    case _ =>
      val p = filePath(table, d)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try {
        val version = in.readByte()
        require(version == 1, s"unsupported DV file format version $version in $p")
        val off = d.offset.getOrElse(throw new IllegalArgumentException(
          s"deletion-vector descriptor for $p has no offset"))
        in.seek(off.toLong)
        val size = in.readInt()
        require(size == d.sizeInBytes,
          s"DV size mismatch in $p: file says $size, descriptor ${d.sizeInBytes}")
        val data = new Array[Byte](size)
        in.readFully(data)
        val expected = in.readInt()
        val crc = new CRC32()
        crc.update(data)
        require(crc.getValue.toInt == expected, s"DV checksum mismatch in $p")
        deserializeRows(data)
      } finally in.close()
  }

  /** `(qualified data-file path, deleted row index)` rows for every file
    * carrying a DV — expanded ON EXECUTORS (one task per DV; a 100 TB
    * table's DVs never funnel through the driver), ready to anti-join
    * against `_metadata.file_path` / `row_index`. */
  def deletedRows(spark: SparkSession, table: String,
                  dvs: Seq[(String, Descriptor)]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val props = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray)
    val seeds = dvs.map { case (f, d) =>
      (f, d.storageType, d.pathOrInlineDv, d.offset.getOrElse(-1),
        d.sizeInBytes, d.cardinality)
    }
    spark.sparkContext
      .parallelize(seeds, math.max(1, math.min(seeds.size,
        spark.sparkContext.defaultParallelism * 2)))
      .flatMap { case (file, st, pid, off, size, card) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        props.value.foreach { case (k, v) => conf.set(k, v) }
        val d = Descriptor(st, pid, if (off < 0) None else Some(off), size, card)
        val rows = readRows(conf, table, d)
        require(rows.length.toLong == card,
          s"DV cardinality mismatch for $file: bitmap ${rows.length}, descriptor $card")
        rows.iterator.map(r => (file, r))
      }
      .toDF("__qualified", "__pos")
  }
}
