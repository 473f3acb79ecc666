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
  *  - v2 row-level deletes are gated: a manifest entry whose
  *    `data_file.content` ≠ 0 (position/equality deletes) fails LOUDLY —
  *    merging delete files is the documented gap, and silently ignoring
  *    them would resurrect deleted rows.
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

  /** Data-file paths of one snapshot. */
  private def dataFiles(spark: SparkSession, manifestList: String,
                        maxFiles: Int): Seq[String] = {
    val manifests = avroRecords(spark, manifestList)
      .map(_.get("manifest_path").toString)
    val files = manifests.flatMap { m =>
      avroRecords(spark, m).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED entry
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.getSchema.getField("content"))
            .map(_ => df.get("content").asInstanceOf[Int]).getOrElse(0)
          require(content == 0,
            "Iceberg v2 delete files present (content=" + content + ") — " +
              "merging position/equality deletes is not supported; reading " +
              "would silently resurrect deleted rows")
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("PARQUET"),
            s"unsupported Iceberg data file format $fmt")
          Some(df.get("file_path").toString)
        }
      }
    }
    require(files.size <= maxFiles,
      s"snapshot lists ${files.size} files > maxFiles=$maxFiles")
    files
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
    val files = dataFiles(spark, manifestList, maxFiles)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }
}
