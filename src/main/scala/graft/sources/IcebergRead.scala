package graft.sources

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot / time-travel reader for Apache Iceberg tables (the published
  * spec: `metadata/vN.metadata.json` (+ `version-hint.text` for Hadoop
  * tables), snapshots pointing at an Avro MANIFEST LIST, manifests as
  * Avro files of `manifest_entry` records carrying `data_file` structs).
  * Completes the lakehouse-interop trifecta next to [[HudiRead]] and
  * [[DeltaRead]].
  *
  * Avro is self-describing — every manifest embeds its write schema — so
  * this reader navigates by the spec's FIELD NAMES (`manifest_path`,
  * `status`, `data_file.file_path`, `data_file.content`) and works across
  * layout evolution; the Avro runtime comes from Spark's own classpath.
  *
  * Semantics:
  *  - snapshot = current snapshot's manifest list → manifests → data
  *    files with entry status ≠ 2 (DELETED); `snapshotId` time-travels to
  *    any snapshot still in the metadata.
  *  - v2 POSITION deletes (`data_file.content` = 1) are MERGED: deleted
  *    `(file_path, pos)` rows are dropped via an anti join on Spark's
  *    `_metadata.file_path` / `_metadata.row_index`. Equality deletes
  *    (content = 2) fail LOUDLY — they need equality-field resolution +
  *    sequence-number ordering, and silently ignoring them would
  *    resurrect deleted rows.
  *
  * Scale notes: the driver reads metadata JSON + manifest Avro (the same
  * planning data every Iceberg client loads, bounded by `maxFiles`); the
  * data path is one parquet scan with pushdown/pruning intact. */
object IcebergRead {

  private def mapper = DocPushdown.jsonMapper

  /** Resolve the current metadata file: `version-hint.text` if present
    * (Hadoop tables), else the highest `vN.metadata.json`. */
  private def metadataFile(spark: SparkSession, table: String): Path = {
    val dir = new Path(table, "metadata")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) throw new IllegalArgumentException(
      s"$table is not an Iceberg table (no metadata directory)")
    val hint = new Path(dir, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
      new Path(dir, s"v$v.metadata.json")
    } else {
      val versions = fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
        case n if n.startsWith("v") && n.endsWith(".metadata.json") &&
          n.stripPrefix("v").stripSuffix(".metadata.json").forall(_.isDigit) =>
          n.stripPrefix("v").stripSuffix(".metadata.json").toLong
      }.toSeq
      require(versions.nonEmpty, s"$table has no vN.metadata.json files")
      new Path(dir, s"v${versions.max}.metadata.json")
    }
  }

  /** Iterate the records of one Avro object-container file. */
  private def avroRecords(spark: SparkSession, path: String): Seq[GenericRecord] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val stream = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (stream.hasNext) out += stream.next()
      out.toSeq
    } finally { stream.close(); in.close() }
  }

  /** Data + position-delete file paths of one snapshot. Equality deletes
    * (content=2) stay gated: applying them needs the equality field ids +
    * sequence-number ordering, and silently ignoring them would
    * resurrect deleted rows. */
  private def snapshotFiles(spark: SparkSession, manifestList: String,
                            maxFiles: Int): (Seq[String], Seq[String]) = {
    val manifests = avroRecords(spark, manifestList)
      .map(_.get("manifest_path").toString)
    val data = scala.collection.mutable.ArrayBuffer.empty[String]
    val posDeletes = scala.collection.mutable.ArrayBuffer.empty[String]
    manifests.foreach { m =>
      avroRecords(spark, m).foreach { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        if (status != 2) { // 2 = DELETED entry
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.getSchema.getField("content"))
            .map(_ => df.get("content").asInstanceOf[Int]).getOrElse(0)
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("PARQUET"),
            s"unsupported Iceberg file format $fmt")
          content match {
            case 0 => data += df.get("file_path").toString
            case 1 => posDeletes += df.get("file_path").toString
            case other => throw new IllegalArgumentException(
              "Iceberg equality-delete files present (content=" + other +
                ") — merging equality deletes is not supported; reading " +
                "would silently resurrect deleted rows")
          }
        }
      }
    }
    require(data.size + posDeletes.size <= maxFiles,
      s"snapshot lists ${data.size + posDeletes.size} files > maxFiles=$maxFiles")
    (data.toSeq, posDeletes.toSeq)
  }

  /** Snapshot ids available for time travel, ascending by sequence. */
  def snapshots(spark: SparkSession, table: String): Seq[Long] = {
    val meta = readMetadata(spark, table)
    import scala.jdk.CollectionConverters._
    Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala.map(_.get("snapshot-id").asLong()))
  }

  private def readMetadata(spark: SparkSession, table: String) = {
    val p = metadataFile(spark, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    mapper.readTree(json)
  }

  /** Read the current (or `snapshotId`) snapshot. */
  def snapshot(spark: SparkSession, table: String,
               snapshotId: Option[Long] = None,
               maxFiles: Int = 1000000): DataFrame = {
    val meta = readMetadata(spark, table)
    val wanted = snapshotId.getOrElse {
      val cur = Option(meta.get("current-snapshot-id")).map(_.asLong()).getOrElse(
        throw new IllegalArgumentException("metadata has no current-snapshot-id"))
      require(cur != -1L, "table has no current snapshot (empty table)")
      cur
    }
    import scala.jdk.CollectionConverters._
    val snap = Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .find(_.get("snapshot-id").asLong() == wanted)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $wanted not present in metadata (expired?)"))
    val manifestList = snap.get("manifest-list").asText()
    val (files, posDeletes) = snapshotFiles(spark, manifestList, maxFiles)
    if (files.isEmpty) spark.emptyDataFrame
    else if (posDeletes.isEmpty) spark.read.parquet(files: _*)
    else applyPositionDeletes(spark, files, posDeletes)
  }

  /** v2 position deletes: drop rows matching `(file_path, pos)` from the
    * delete files — an ANTI JOIN on Spark's `_metadata` columns
    * (`file_path`, `row_index`), which exist for exactly this kind of
    * row-position bookkeeping. Delete files name data files by their
    * MANIFEST path spelling, while `_metadata.file_path` is the
    * filesystem-qualified URI, so a broadcast qualified→manifest map
    * bridges the two (guarded: an unmapped file raises rather than
    * silently keeping its deleted rows).
    *
    * Scale shape: the data side stays one pushdown-capable parquet scan;
    * the delete side is its own scan shuffled only on
    * `(file_path, pos)` — no driver materialization of either. A
    * position delete references its data file by exact path, so applying
    * every delete file of the snapshot to every data row needs no
    * sequence-number ordering (that subtlety belongs to equality
    * deletes, which stay gated). */
  private def applyPositionDeletes(spark: SparkSession, files: Seq[String],
                                   posDeletes: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val conf = spark.sparkContext.hadoopConfiguration
    // _metadata.file_path carries the Hadoop Path rendering of the
    // qualified path (file:/x, not the URI form file:///x)
    val pathMap = files.map { p =>
      val hp = new Path(p)
      (hp.getFileSystem(conf).makeQualified(hp).toString, p)
    }
    val mapDf = spark.createDataFrame(pathMap).toDF("__qualified", "__manifest_path")
    val data = spark.read.parquet(files: _*)
    val cols = data.columns.toSeq
    val keyed = data
      .withColumn("__qualified", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(broadcast(mapDf), Seq("__qualified"), "left")
      .withColumn("__manifest_path",
        when(col("__manifest_path").isNull, raise_error(concat(
          lit("Iceberg position-delete merge: data file not in path map: "),
          col("__qualified")))).otherwise(col("__manifest_path")))
    val deletes = spark.read.parquet(posDeletes: _*)
      .select(col("file_path").as("__manifest_path"), col("pos").as("__pos"))
    keyed.join(deletes, Seq("__manifest_path", "__pos"), "left_anti")
      .select(cols.map(col): _*)
  }
}
