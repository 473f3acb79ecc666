package graft.sink

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.schema.{MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession

import graft.sources.{HudiLogFormat, HudiRead}

/** MOR COMPACTION table service — the maintenance operation every
  * merge-on-read table lives by: fold each file group's visible log
  * records into a fresh base file at a new compaction instant
  * (`<instant>.commit` on the timeline, exactly how Hudi commits
  * compactions), after which the old logs stop applying
  * ([[HudiRead]]'s slice resolution already reads the new base) and the
  * snapshot becomes a pure parquet scan again.
  *
  * Execution shape is Hudi's own: ONE Spark job, one task per file
  * slice — each task streams its base parquet (parquet-hadoop Group
  * API, the same executor-side machinery the change tails use), decodes
  * its log blocks ([[HudiLogFormat]]), elects latest-per-key in the log
  * order the snapshot reader uses (instant, then block, then record;
  * delete-block tombstones and `_hoodie_is_deleted` payloads drop
  * out), and writes the merged rows as the new base file. No driver
  * loop over groups, no whole-table shuffle — a file slice is the unit
  * of compaction parallelism by design.
  *
  * Scope gates (loud): flat primitive schemas only (the shapes
  * [[HudiMorWrite]] writes — string/long/int/double/float/boolean);
  * INT96 / DECIMAL / nested base columns are refused by name. */
object HudiCompact {

  /** Everything one task needs to compact one file slice. */
  private final case class Slice(partition: String, fileId: String,
                                 basePath: Option[String],
                                 logPaths: Seq[String],
                                 newBasePath: String)

  /** Compact every log-carrying file group visible at the latest
    * completed instant. `instant` must sort after every completed
    * instant. Returns the number of compacted file slices. */
  def compact(spark: SparkSession, table: String, instant: String,
              maxFiles: Int = 1000000): Int = {
    val instants = HudiRead.completedInstants(spark, table)
    require(instants.nonEmpty, s"$table has no completed commits")
    require(instants.forall(i => HudiRead.instantKey(i) <
        HudiRead.instantKey(instant)),
      s"compaction instant $instant must sort after every completed " +
        s"instant (latest: ${instants.last})")
    val ceiling = instants.last
    val slices = HudiRead.compactionSlices(spark, table, ceiling, maxFiles)
    if (slices.isEmpty) return 0
    val work = slices.map { case (partition, fileId, base, logs) =>
      val dir = if (partition.isEmpty) table else s"$table/$partition"
      Slice(partition, fileId, base, logs,
        s"$dir/${fileId}_0-1-2_$instant.parquet")
    }
    val visible = instants.toSet
    val props = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray)
    val written = spark.sparkContext
      .parallelize(work, work.size)
      .map { slice =>
        val conf = new Configuration(false)
        props.value.foreach { case (k, v) => conf.set(k, v) }
        compactSlice(conf, slice, visible, ceiling)
        val np = new Path(slice.newBasePath)
        (slice.partition, slice.fileId,
          np.getFileSystem(conf).getFileStatus(np).getLen)
      }.collect() // bounded by slice count — the planning unit
    // commit the compaction on the timeline (Hudi compactions land as
    // `.commit`, not `.deltacommit`), its new bases in the write stats
    val stats = written.toSeq.map { case (partition, fileId, size) =>
      val name = s"${fileId}_0-1-2_$instant.parquet"
      HudiMorWrite.WriteStat(partition, fileId,
        if (partition.isEmpty) name else s"$partition/$name", size)
    }
    HudiMorWrite.completeInstant(spark, table, instant, "commit", stats)
    written.length
  }

  // ---- executor side ----------------------------------------------------

  private def compactSlice(conf: Configuration, slice: Slice,
                           visibleInstants: Set[String], ceiling: String): Unit = {
    // decode this slice's log stream in reader order
    val blocks = slice.logPaths.flatMap { p =>
      val hp = new Path(p)
      val in = hp.getFileSystem(conf).open(hp)
      try HudiLogFormat.readBlocks(in) finally in.close()
    }
    val visible = HudiLogFormat.effectiveBlocks(blocks)
      .filter(b => visibleInstants.contains(
        b.header.getOrElse(HudiLogFormat.HeaderInstantTime, "")) &&
        b.header.getOrElse(HudiLogFormat.HeaderInstantTime, "") <= ceiling)
      .sortBy(b => b.header.getOrElse(HudiLogFormat.HeaderInstantTime, ""))
    // election state: key → Some(record) (latest payload) or None (tombstone)
    val latest = new java.util.LinkedHashMap[String,
      Option[org.apache.avro.generic.GenericRecord]]()
    visible.foreach { b =>
      if (b.blockType == HudiLogFormat.TypeDelete)
        HudiLogFormat.deleteKeys(b).foreach { case (key, _) =>
          latest.put(key, None)
        }
      else HudiLogFormat.avroRecords(b).foreach { rec =>
        val key = String.valueOf(rec.get("_hoodie_record_key"))
        latest.put(key, Some(rec))
      }
    }
    val schema: MessageType = slice.basePath match {
      case Some(base) => parquetSchema(conf, base)
      case None =>
        val avro = visible.collectFirst {
          case b if b.blockType == HudiLogFormat.TypeAvroData =>
            b.header(HudiLogFormat.HeaderSchema)
        }.getOrElse(throw new IllegalStateException(
          s"log-only group ${slice.fileId} has no Avro data block"))
        fromAvro(new org.apache.avro.Schema.Parser().parse(avro))
    }
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new Path(slice.newBasePath)).withConf(conf).build()
    try {
      // base rows not overridden by the log copy through verbatim
      slice.basePath.foreach { base =>
        val reader = ParquetReader.builder(new GroupReadSupport(), new Path(base))
          .withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            val keyIdx = g.getType.getFieldIndex("_hoodie_record_key")
            val key = g.getString(keyIdx, 0)
            if (!latest.containsKey(key)) writer.write(g)
            g = reader.read()
          }
        } finally reader.close()
      }
      // elected log records (tombstones and deleted payloads drop out)
      latest.forEach { (_, rec) =>
        rec.foreach { r =>
          val isDeleted = Option(r.getSchema.getField("_hoodie_is_deleted"))
            .flatMap(f => Option(r.get(f.pos())))
            .exists { case b: java.lang.Boolean => b.booleanValue; case _ => false }
          if (!isDeleted) writer.write(avroToGroup(r, schema))
        }
      }
    } finally writer.close()
  }

  private def parquetSchema(conf: Configuration, path: String): MessageType = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new Path(path), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val schema = r.getFooter.getFileMetaData.getSchema
      schema.getFields.asScala.foreach { f =>
        require(f.isPrimitive, s"nested base column ${f.getName} — " +
          "compaction supports flat primitive schemas")
        val pt = f.asPrimitiveType().getPrimitiveTypeName
        require(pt != INT96, s"INT96 column ${f.getName} not supported")
        require(!f.asPrimitiveType().getLogicalTypeAnnotation
            .isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation],
          s"DECIMAL column ${f.getName} not supported")
      }
      schema
    } finally r.close()
  }

  /** Flat Avro record schema → parquet MessageType (the primitive shapes
    * HudiMorWrite's log writer emits). */
  private def fromAvro(s: org.apache.avro.Schema): MessageType = {
    // nullable unions ["null", T] (tombstone-carrying log blocks) map to
    // their non-null branch — parquet fields are optional anyway
    def unwrap(fs: org.apache.avro.Schema): org.apache.avro.Schema =
      if (fs.getType == org.apache.avro.Schema.Type.UNION) {
        val nonNull = fs.getTypes.asScala
          .filter(_.getType != org.apache.avro.Schema.Type.NULL)
        require(nonNull.size == 1,
          s"unsupported non-nullable Avro union $fs")
        nonNull.head
      } else fs
    val fields = s.getFields.asScala.map { f =>
      unwrap(f.schema()).getType match {
        case org.apache.avro.Schema.Type.STRING => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name())
        case org.apache.avro.Schema.Type.LONG =>
          Types.optional(INT64).named(f.name())
        case org.apache.avro.Schema.Type.INT =>
          Types.optional(INT32).named(f.name())
        case org.apache.avro.Schema.Type.DOUBLE =>
          Types.optional(DOUBLE).named(f.name())
        case org.apache.avro.Schema.Type.FLOAT =>
          Types.optional(FLOAT).named(f.name())
        case org.apache.avro.Schema.Type.BOOLEAN =>
          Types.optional(BOOLEAN).named(f.name())
        case other => throw new IllegalArgumentException(
          s"unsupported log field type $other for ${f.name()}")
      }
    }
    fields.foldLeft(Types.buildMessage(): Types.GroupBuilder[MessageType])(
      _.addField(_)).named("graft_compacted")
  }

  /** One Avro log record → a parquet Group of `schema` (by field name;
    * absent/null values stay absent — optional fields). */
  private def avroToGroup(rec: org.apache.avro.generic.GenericRecord,
                          schema: MessageType): Group = {
    val g = new SimpleGroup(schema)
    schema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
      val v = Option(rec.getSchema.getField(f.getName))
        .flatMap(af => Option(rec.get(af.pos())))
      v.foreach { value =>
        val pt: PrimitiveType = f.asPrimitiveType()
        pt.getPrimitiveTypeName match {
          case BINARY => g.add(i, String.valueOf(value))
          case INT64 => g.add(i, value.asInstanceOf[java.lang.Long].longValue)
          case INT32 => g.add(i, value.asInstanceOf[java.lang.Integer].intValue)
          case DOUBLE => g.add(i, value.asInstanceOf[java.lang.Double].doubleValue)
          case FLOAT => g.add(i, value.asInstanceOf[java.lang.Float].floatValue)
          case BOOLEAN => g.add(i, value.asInstanceOf[java.lang.Boolean].booleanValue)
          case other => throw new IllegalArgumentException(
            s"unsupported parquet type $other for ${f.getName}")
        }
      }
    }
    g
  }
}
