package graft.streaming

import org.apache.spark.sql.types._

/** CDC event model — the binlog-shaped row stream the reference's
  * `mysql-binlog` source emits (HoodieBinlogDeltaStreamer.scala:77-89): one
  * row per change event, carrying the origin (db, table), the operation,
  * a monotonic source offset (binlog file index + position collapsed to one
  * long for resume), the event timestamp, and the row image as JSON.
  *
  * The payload rides as JSON so ONE unbounded stream can carry rows of many
  * tables with different schemas; each table's schema is resolved at the
  * sink from the per-table registry and applied with `from_json`
  * (schema-on-demux, exactly how multi-table CDC buses are shipped on
  * Kafka + Spark in practice). */
object CdcSchema {

  val OpInsert = "insert"
  val OpUpdate = "update"
  val OpDelete = "delete"

  /** Stream schema: every CDC source (file-backed, Kafka-backed, memory) must
    * produce exactly this shape. */
  val EventSchema: StructType = StructType(Seq(
    StructField("db", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** [[EventSchema]] plus the UPDATE rows' BEFORE image (null for
    * insert/delete) — the binlog ships both images on the wire, and the
    * preimage is what additive consumers
    * ([[graft.streaming.IncrementalAgg]]) need to subtract the old
    * contribution. Opt-in on the binlog source via `emitPreimages`. */
  val EventSchemaWithBefore: StructType =
    StructType(EventSchema.fields :+
      StructField("before", StringType, nullable = true))
}

/** Two-part binlog position (reference
  * `HoodieBinlogDeltaStreamer.scala:206-219`: `--binlog-index` = numeric
  * suffix of the binlog file, `--binlog-file-offset` = byte position within
  * it), encoded into the stream's single monotonic 64-bit `offset`:
  * file index in the high 21 bits (2M binlog files), position in the low 42
  * (4 TiB — MySQL caps a binlog file at 1 GiB + one trailing event). The
  * encoding is order-preserving, so "resume from (index, pos)" is a simple
  * `offset >= encoded` predicate on the stream. */
final case class BinlogOffset(fileIndex: Long, filePos: Long) {
  import BinlogOffset._
  require(fileIndex >= 0 && fileIndex <= MaxIndex,
    s"binlog index out of range: $fileIndex (max $MaxIndex)")
  require(filePos >= 0 && filePos <= MaxPos,
    s"binlog file offset out of range: $filePos (max $MaxPos)")
  def encoded: Long = (fileIndex << PosBits) | filePos
}

object BinlogOffset {
  val PosBits = 42
  val MaxPos: Long = (1L << PosBits) - 1
  val MaxIndex: Long = (1L << (63 - PosBits)) - 1
  def decode(offset: Long): BinlogOffset =
    BinlogOffset(offset >>> PosBits, offset & MaxPos)
}

/** Per-table sink registry entry: payload schema + lake-table key spec,
  * parsed from the reference's `${db}.${table}.hoodie.*` config namespace
  * (hoodie_table_meta.properties:1-10; naming rule
  * docs/binlog/01.Binary Logs Ingestion.md:50). */
final case class CdcTableSpec(
    db: String,
    table: String,
    payloadSchema: StructType,
    recordKeyFields: Seq[String],
    precombineField: String,
    partitionFields: Seq[String] = Nil,
    transformerSql: Option[String] = None)
