package org.apache.spark.sql.graftshim

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Write-side sibling of [[ParquetReadShim]]: bridges Spark's
  * `private[sql]` parquet `OutputWriterFactory` so a DataSource V2
  * writer (the bucketed graft lake) produces files with the SAME
  * engine-grade machinery as Spark's own file sinks — codec, dictionary
  * encoding, column statistics. [[factory]] runs on the DRIVER (it
  * prepares the job conf); the returned handle is serializable and
  * [[RowSink]]s open per-file on executors. graft code never touches a
  * `private[sql]` type: the factory travels as a [[WriterHandle]]. */
object ParquetWriteShim {

  /** Hadoop `Configuration` is not `Serializable`; Spark's own wrapper
    * is `private[spark]`, so carry one the same way it does. */
  final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Serializable driver-prepared writer state. */
  final class WriterHandle private[ParquetWriteShim] (
      private[ParquetWriteShim] val factory: OutputWriterFactory,
      private[ParquetWriteShim] val conf: SerializableConf,
      val schema: StructType) extends Serializable

  /** Executor-side single-file writer. */
  final class RowSink private[ParquetWriteShim] (
      w: org.apache.spark.sql.execution.datasources.OutputWriter) {
    def write(r: InternalRow): Unit = w.write(r)
    def close(): Unit = w.close()
    def path(): String = w.path()
  }

  /** DRIVER: prepare a parquet writer factory for `schema` with the
    * session's SQL options (codec etc) folded into a fresh job conf. */
  def prepare(spark: SparkSession, schema: StructType): WriterHandle = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    new WriterHandle(factory, new SerializableConf(job.getConfiguration), schema)
  }

  /** EXECUTOR: open one parquet file under `dir` (unique name). */
  def open(handle: WriterHandle, dir: String, taskId: Int): RowSink = {
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-write", 0), TaskType.MAP, taskId), 0)
    val ctx = new TaskAttemptContextImpl(handle.conf.value, attempt)
    val name =
      s"part-$taskId-${UUID.randomUUID()}${handle.factory.getFileExtension(ctx)}"
    new RowSink(handle.factory.newInstance(s"$dir/$name", handle.schema, ctx))
  }
}
