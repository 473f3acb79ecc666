package graft.sink

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericRecord, GenericRecordBuilder}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.sources.HudiLogFormat

/** Minimal Apache Hudi MERGE-ON-READ writer — the write-side mirror of
  * [[graft.sources.HudiRead]]'s MOR read path, producing the REAL format
  * (base parquet named `<fileId>_<writeToken>_<instant>.parquet`, hidden
  * Avro log files in [[HudiLogFormat]]'s published block layout, and a
  * `.hoodie/` timeline of completed instants), so the tables are
  * readable by Hudi itself. Single file group per partition, single
  * writer — the conformance/round-trip scope; production fan-out builds
  * on [[MergeWriter]]'s lake layer.
  */
object HudiMorWrite {

  private[sink] def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[sink] def completeInstant(spark: SparkSession, table: String,
                              instant: String, action: String): Unit = {
    val dir = new Path(table, ".hoodie")
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val out = f.create(new Path(dir, s"$instant.$action"), true)
    try out.write("{}".getBytes(UTF_8)) finally out.close()
  }

  /** Initial base file: `df` written as ONE base parquet for file group
    * `fileId` at `instant`, committed on the timeline. The frame must
    * already carry the `_hoodie_record_key` / `_hoodie_commit_time` meta
    * columns (like every meta-field Hudi table). */
  def writeBase(df: DataFrame, table: String, partition: String,
                fileId: String, instant: String): Unit = {
    writeBaseFile(df, table, partition, fileId, instant)
    completeInstant(df.sparkSession, table, instant, "commit")
  }

  /** One base parquet for `fileId` at `instant`, NO timeline commit —
    * multi-group commits ([[HudiCowWrite.upsert]]) write all their
    * files first and complete the instant once. */
  private[sink] def writeBaseFile(df: DataFrame, table: String,
                                  partition: String, fileId: String,
                                  instant: String): Unit = {
    val spark = df.sparkSession
    val partDir = new Path(table, partition)
    val tmp = new Path(table, s".base-tmp-$instant-$fileId")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val f = fs(spark, partDir)
    f.mkdirs(partDir)
    val part = f.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("base write produced no parquet"))
    f.rename(part, new Path(partDir, s"${fileId}_0-1-2_$instant.parquet"))
    f.delete(tmp, true)
  }

  /** Append `df`'s rows as ONE Avro log block on `fileId`'s log stream
    * (delta commit at `instant`). Rows are encoded with an Avro schema
    * derived from the frame (strings/longs/doubles/ints/booleans — the
    * meta-column + payload shapes Hudi logs carry); the collect is
    * bounded by the delta batch the caller hands in, which is the
    * write-side unit everywhere (MOR deltas are small by contract —
    * that's why compaction exists). */
  def appendLog(df: DataFrame, table: String, partition: String,
                fileId: String, baseInstant: String, instant: String,
                logVersion: Int = 1): Unit = {
    val spark = df.sparkSession
    val schema = avroSchemaOf(df)
    val rows: Array[Row] = df.collect()
    val records: Seq[GenericRecord] = rows.toSeq.map { r =>
      val b = new GenericRecordBuilder(schema)
      df.schema.fieldNames.zipWithIndex.foreach { case (n, i) =>
        b.set(n, r.get(i))
      }
      b.build()
    }
    val block = HudiLogFormat.avroDataBlock(instant, schema, records)
    writeLogBlock(spark, table, partition, fileId, baseInstant, logVersion, block)
    completeInstant(spark, table, instant, "deltacommit")
  }

  /** Append a DELETE block (0.9-vintage Kryo `HoodieKey[]` payload,
    * [[HudiLogFormat.deleteBlock]]) on `fileId`'s log stream: hard-deletes
    * the given record keys at `instant` — the second way Hudi expresses
    * row deletes next to `_hoodie_is_deleted` payloads. */
  def appendDeleteLog(spark: SparkSession, keys: Seq[(String, String)],
                      table: String, partition: String, fileId: String,
                      baseInstant: String, instant: String,
                      logVersion: Int = 2): Unit = {
    writeLogBlock(spark, table, partition, fileId, baseInstant, logVersion,
      HudiLogFormat.deleteBlock(instant, keys))
    completeInstant(spark, table, instant, "deltacommit")
  }

  private def writeLogBlock(spark: SparkSession, table: String,
                            partition: String, fileId: String,
                            baseInstant: String, logVersion: Int,
                            block: HudiLogFormat.LogBlock): Unit = {
    val logPath = new Path(new Path(table, partition),
      s".${fileId}_$baseInstant.log.${logVersion}_0-1-2")
    val f = fs(spark, logPath)
    val out = new java.io.DataOutputStream(f.create(logPath, true))
    try HudiLogFormat.writeBlock(out, block) finally out.close()
  }

  private def avroSchemaOf(df: DataFrame): Schema = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.map { f =>
      val t = f.dataType match {
        case StringType => "\"string\""
        case LongType => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType => "\"double\""
        case FloatType => "\"float\""
        case BooleanType => "\"boolean\""
        case other => throw new IllegalArgumentException(
          s"unsupported log column type $other for ${f.name}")
      }
      s"""{"name":${quote(f.name)},"type":$t}"""
    }
    new Schema.Parser().parse(
      s"""{"type":"record","name":"graft_mor","fields":[${fields.mkString(",")}]}""")
  }

  private def quote(s: String): String =
    graft.sources.DocPushdown.jsonMapper.writeValueAsString(s)
}
