package org.apache.spark.sql.graftshim

import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** Bridge into Spark's `private[sql]` Arrow machinery — the SAME
  * schema-mapping and row→vector writers Spark uses for its own Arrow
  * surfaces (pandas UDFs, `toArrow`), so the graft Arrow IPC source
  * writes/reads exactly the Arrow types Spark itself would. */
object ArrowShim {

  /** Spark's shared root allocator (sized by Spark's own config). */
  def allocator: BufferAllocator = ArrowUtils.rootAllocator

  def toArrowSchema(schema: StructType, timeZoneId: String)
      : org.apache.arrow.vector.types.pojo.Schema =
    ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  def fromArrowSchema(schema: org.apache.arrow.vector.types.pojo.Schema)
      : StructType =
    ArrowUtils.fromArrowSchema(schema)

  /** InternalRow → populated [[VectorSchemaRoot]] batches. */
  final class RowBatcher(schema: StructType, timeZoneId: String,
                         alloc: BufferAllocator) {
    val root: VectorSchemaRoot =
      VectorSchemaRoot.create(toArrowSchema(schema, timeZoneId), alloc)
    private val writer = ArrowWriter.create(root)
    def write(row: InternalRow): Unit = writer.write(row)
    def finish(): Unit = writer.finish()
    def reset(): Unit = writer.reset()
    def close(): Unit = root.close()
  }
}
