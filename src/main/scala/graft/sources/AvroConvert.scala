package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal Avro → Spark conversion for table-format metadata and MOR log
  * records ([[HudiLogFormat]]): the standard primitive/logical types plus
  * nullable unions, records, arrays and maps — the shapes Hudi writes for
  * table rows. Anything else fails loudly by name rather than
  * mis-converting. */
object AvroConvert {

  /** Avro schema → Spark type. Unions must be `[null, T]` (Avro's
    * nullable encoding). */
  def toSparkType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.INT =>
      if (logical(schema) == "date") DateType else IntegerType
    case Schema.Type.LONG => logical(schema) match {
      case "timestamp-millis" | "timestamp-micros" => TimestampType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      if (logical(schema) == "decimal") {
        val d = schema.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
        DecimalType(d.getPrecision, d.getScale)
      } else BinaryType
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.map(f =>
        StructField(f.name(), toSparkType(f.schema()),
          nullable = isNullable(f.schema()))).toSeq)
    case Schema.Type.ARRAY =>
      ArrayType(toSparkType(schema.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toSparkType(schema.getValueType))
    case Schema.Type.UNION =>
      val branches = schema.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"unsupported non-nullable Avro union ${schema}")
      toSparkType(branches.head)
    case other => throw new IllegalArgumentException(
      s"unsupported Avro type $other")
  }

  private def logical(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** Avro runtime value → external Spark Row value for `dt`. */
  def toSparkValue(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // Utf8 / String / enum symbol
      case IntegerType | LongType | FloatType | DoubleType | BooleanType => v
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Number].longValue()))
      case TimestampType =>
        val micros = v.asInstanceOf[Number].longValue()
        // caller guarantees micros (Hudi writes timestamp-micros); millis
        // schemas are normalized by the schema-aware record converter
        new java.sql.Timestamp(micros / 1000L)
      case BinaryType => v match {
        case b: java.nio.ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case f: org.apache.avro.generic.GenericFixed => f.bytes()
        case a: Array[Byte] => a
      }
      case d: DecimalType => v match {
        case b: java.nio.ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
          BigDecimal(new java.math.BigInteger(a), d.scale)
        case f: org.apache.avro.generic.GenericFixed =>
          BigDecimal(new java.math.BigInteger(f.bytes()), d.scale)
      }
      case st: StructType => toRow(v.asInstanceOf[GenericRecord], st)
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.Collection[Any]].asScala
          .map(toSparkValue(_, et)).toSeq
      case MapType(_, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, mv) =>
          k.toString -> toSparkValue(mv, vt)
        }.toMap
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type $other for Avro value $v")
    }

  /** GenericRecord → Row shaped by `schema` (fields matched BY NAME;
    * fields absent from the record become null — schema evolution). */
  def toRow(rec: GenericRecord, schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map { f =>
      if (rec.getSchema.getField(f.name) == null) null
      else toSparkValue(rec.get(f.name), f.dataType)
    })
}
