package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Apache Avro OBJECT CONTAINER FILE source/sink (`graft-avro`) — the
  * row-oriented interchange format of the Kafka/Hadoop world, read
  * without any spark-avro dependency:
  *
  *  - `read` lists a file/dir/glob, takes the schema from the first
  *    file's header ([[AvroConvert]]'s mapping: primitives, logical
  *    date/timestamp/decimal, nullable unions, records, arrays, maps),
  *    and scans EXECUTOR-PARALLEL with real intra-file splitting on the
  *    container format's sync markers (`DataFileReader.sync(start)` /
  *    `pastSync(end)` — the same split contract avro-mapred uses), so a
  *    handful of huge Avro files still fans out across the cluster
  *    instead of one task per file.
  *  - `write` emits one container file per partition (deterministic
  *    part numbering, any codec the avro runtime knows: `null`,
  *    `deflate`, …) — the fixture/round-trip leg.
  *
  * Decompression rides the container codec recorded per file, so a mix
  * of plain and deflate files reads transparently. Schema evolution
  * across files resolves BY NAME against the first file's schema
  * (absent fields read null), matching [[AvroConvert.toRow]]. */
object AvroSource {

  /** Resolve `pattern` (file, directory, or glob) to `.avro` files. */
  private def listFiles(spark: SparkSession, pattern: String)
      : Seq[(String, Long)] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
    matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => !s.isDirectory && s.getPath.getName.endsWith(".avro"))
      else Seq(st)
    }.map(st => (st.getPath.toString, st.getLen)).sortBy(_._1)
  }

  private def isTsMillis(s: Schema): Boolean = {
    val branch =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
      else s
    Option(branch.getLogicalType).exists(_.getName == "timestamp-millis")
  }

  /** GenericRecord → Row: [[AvroConvert.toSparkValue]] plus correct
    * `timestamp-millis` handling (the record's own field schema decides
    * the unit; [[AvroConvert]]'s table-format callers are micros-only). */
  private[sources] def rowOf(rec: GenericRecord, schema: StructType): Row =
    Row.fromSeq(schema.fields.toSeq.map { f =>
      val af = rec.getSchema.getField(f.name)
      if (af == null) null
      else (f.dataType, rec.get(f.name)) match {
        case (_, null) => null
        case (TimestampType, n: Number) if isTsMillis(af.schema()) =>
          new java.sql.Timestamp(n.longValue())
        case (TimestampType, n: Number) => // timestamp-micros, sub-milli
          // precision kept (AvroConvert's table-format callers truncate)
          val micros = n.longValue()
          val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          ts
        case (dt, v) => AvroConvert.toSparkValue(v, dt)
      }
    })

  /** Read `.avro` container files into a DataFrame. `maxSplitBytes`
    * bounds the per-task byte range (sync-marker aligned). */
  def read(spark: SparkSession, pattern: String,
           maxSplitBytes: Long = 128L << 20): DataFrame = {
    require(maxSplitBytes > 0, "maxSplitBytes must be positive")
    val files = listFiles(spark, pattern)
    require(files.nonEmpty, s"no .avro files match $pattern")
    val conf = spark.sparkContext.hadoopConfiguration
    val headIn = new FsInput(new Path(files.head._1), conf)
    val avroSchema = {
      val r = new DataFileReader[GenericRecord](headIn,
        new GenericDatumReader[GenericRecord]())
      try r.getSchema finally r.close()
    }
    require(avroSchema.getType == Schema.Type.RECORD,
      s"top-level Avro type must be a record, got ${avroSchema.getType}")
    val schema = AvroConvert.toSparkType(avroSchema).asInstanceOf[StructType]
    val splits = files.flatMap { case (f, len) =>
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      (0L until n).map(i =>
        (f, i * maxSplitBytes, math.min(len, (i + 1) * maxSplitBytes)))
    }
    val props = spark.sparkContext.broadcast(
      conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray)
    val rdd = spark.sparkContext
      .parallelize(splits, splits.size)
      .flatMap { case (f, start, end) =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        props.value.foreach { case (k, v) => c.set(k, v) }
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new Path(f), c), new GenericDatumReader[GenericRecord]())
        // the avro-mapred split contract: advance to the first sync at or
        // after `start` (the fresh reader already sits on the first block,
        // so split 0 must NOT sync — it would skip the first block), stop
        // once past the first sync after `end`
        if (start > 0) reader.sync(start)
        new Iterator[Row] {
          private var closed = false
          override def hasNext: Boolean = {
            val h = !closed && reader.hasNext && !reader.pastSync(end)
            if (!h && !closed) { reader.close(); closed = true }
            h
          }
          override def next(): Row = rowOf(reader.next(), schema)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Spark type → Avro schema (every field a nullable union, Avro's
    * convention). Logical types: date, timestamp-micros, decimal. */
  private[sources] def toAvroSchema(schema: StructType,
                                    name: String = "graft_record"): Schema = {
    def of(dt: DataType, field: String): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType => org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType => org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
      case d: DecimalType => org.apache.avro.LogicalTypes
        .decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, _) => Schema.createArray(nullable(et, field))
      case MapType(StringType, vt, _) => Schema.createMap(nullable(vt, field))
      case st: StructType => toAvroSchema(st, s"${name}_$field")
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type $other for Avro field $field")
    }
    def nullable(dt: DataType, field: String): Schema =
      Schema.createUnion(java.util.List.of(
        Schema.create(Schema.Type.NULL), of(dt, field)))
    Schema.createRecord(name, null, "graft", false,
      schema.fields.toSeq.map(f =>
        new Schema.Field(f.name, nullable(f.dataType, f.name),
          null, Schema.Field.NULL_DEFAULT_VALUE)).asJava)
  }

  /** External Row value → Avro runtime value for `dt`. */
  private def avroValue(v: Any, dt: DataType, fieldSchema: Schema): Any =
    if (v == null) null
    else dt match {
      case StringType | LongType | DoubleType | FloatType | BooleanType => v
      case IntegerType => v
      case ShortType => v.asInstanceOf[Short].toInt
      case ByteType => v.asInstanceOf[Byte].toInt
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case DateType =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case TimestampType =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
      case d: DecimalType =>
        val bd = (v: @unchecked) match {
          case b: java.math.BigDecimal => b
          case b: BigDecimal => b.bigDecimal
        }
        java.nio.ByteBuffer.wrap(
          bd.setScale(d.scale).unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        val es = branch(fieldSchema).getElementType
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(avroValue(_, et, es)).asJava
      case MapType(_, vt, _) =>
        val vs = branch(fieldSchema).getValueType
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, mv) => k -> avroValue(mv, vt, vs) }.asJava
      case st: StructType => recordOf(v.asInstanceOf[Row], st,
        branch(fieldSchema))
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type $other")
    }

  private def branch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def recordOf(row: Row, schema: StructType,
                       avroSchema: Schema): GenericRecord = {
    val rec = new GenericData.Record(avroSchema)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, avroValue(row.get(i), f.dataType,
        avroSchema.getField(f.name).schema()))
    }
    rec
  }

  /** Write `df` as Avro container files under `dir` — one file per
    * partition, written BY the executor holding it (no driver funnel).
    * Returns the written paths. `syncIntervalBytes` tunes block (and
    * thus read-split) granularity. */
  def write(df: DataFrame, dir: String, codec: String = "null",
            syncIntervalBytes: Int = 64 * 1024): Seq[String] = {
    val spark = df.sparkSession
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString
    val props = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray)
    df.rdd.mapPartitionsWithIndex { case (i, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val c = new org.apache.hadoop.conf.Configuration(false)
        props.value.foreach { case (k, v) => c.set(k, v) }
        val avroSchema = new Schema.Parser().parse(avroJson)
        val p = new Path(dir, f"part-$i%05d.avro")
        val out = p.getFileSystem(c).create(p, false)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        w.setSyncInterval(syncIntervalBytes)
        if (codec != "null") w.setCodec(CodecFactory.fromString(codec))
        w.create(avroSchema, out)
        try rows.foreach(r => w.append(recordOf(r, schema, avroSchema)))
        finally w.close()
        Iterator.single(p.toString)
      }
    }.collect().toSeq.sorted
  }
}
