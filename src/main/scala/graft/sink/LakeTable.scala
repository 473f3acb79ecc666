package graft.sink

import graft.core.ConfigLayer

/** Spec of a keyed lake table — the Hudi table semantics the reference writes
  * through (record key + precombine field + partition path + COW/MOR table
  * type; option corpus e.g. hudi_mongodb_batch.properties:9-19,
  * boxer-es/src/test/scala/.../HoodieBatchTest.scala:23-36).
  *
  * Option keys are kept name-compatible with the reference's surface so its
  * properties files configure this writer unchanged.
  */
final case class LakeTable(
    path: String,
    tableName: String,
    recordKeyFields: Seq[String],
    precombineField: String,
    partitionFields: Seq[String] = Nil,
    tableType: String = LakeTable.CopyOnWrite,
    /** stamp per-record meta columns (`_graft_commit_time`,
      * `_graft_record_key`) on write — the analog of Hudi's
      * `_hoodie_commit_time`/`_hoodie_record_key` meta fields
      * (`hoodie.populate.meta.fields`). Required for incremental
      * queries on COPY_ON_WRITE tables. */
    metaFields: Boolean = false) {
  require(recordKeyFields.nonEmpty, "record key field(s) required")
  def isPartitioned: Boolean = partitionFields.nonEmpty
}

object LakeTable {
  val CopyOnWrite = "COPY_ON_WRITE"
  val MergeOnRead = "MERGE_ON_READ"

  // Reference-compatible option keys (hoodie.datasource.write.*).
  val RecordKeyKey = "hoodie.datasource.write.recordkey.field"
  val PrecombineKey = "hoodie.datasource.write.precombine.field"
  val PartitionPathKey = "hoodie.datasource.write.partitionpath.field"
  val TableTypeKey = "hoodie.datasource.write.table.type"
  /** the key the reference's fixtures actually use (e.g.
    * mysql-hudi-import.properties:21, boxer-es HoodieBatchTest.scala:38). */
  val TableTypeKeyShort = "hoodie.table.type"
  val TableNameKey = "hoodie.table.name"
  val OperationKey = "hoodie.datasource.write.operation"
  val MetaFieldsKey = "hoodie.populate.meta.fields"

  private def splitFields(s: String): Seq[String] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Build a spec from a reference-style config namespace.
    * An empty/missing partitionpath.field means non-partitioned — the
    * NonpartitionedKeyGenerator case used throughout the reference corpus. */
  def fromConfig(path: String, conf: ConfigLayer): LakeTable =
    LakeTable(
      path = path,
      tableName = conf.getOrElse(TableNameKey, "graft_table"),
      recordKeyFields = splitFields(conf.requireKey(RecordKeyKey)),
      precombineField = conf.requireKey(PrecombineKey),
      partitionFields = conf.get(PartitionPathKey).map(splitFields).getOrElse(Nil),
      tableType = conf.get(TableTypeKey)
        .orElse(conf.get(TableTypeKeyShort)).getOrElse(CopyOnWrite),
      metaFields = conf.get(MetaFieldsKey).exists(_.trim.equalsIgnoreCase("true")))
}
