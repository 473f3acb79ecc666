package graft.sink

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Minimal Apache Iceberg TABLE COMMITTER — the write-side mirror of
  * [[graft.sources.IcebergRead]]: given already-written parquet data
  * files (and optionally v2 position- or equality-delete files), lays
  * down the spec's metadata chain — Avro manifest of `manifest_entry`
  * records, Avro manifest LIST, `vN.metadata.json` with the snapshot, and
  * `version-hint.text` — so the table is navigable by any Iceberg
  * client. Single snapshot per call, single writer (conformance/
  * round-trip scope).
  *
  * v2 sequence numbers: every entry carries an explicit
  * `sequence_number` (no inheritance games on the write side) and the
  * manifest list records the snapshot's — equality deletes scope by
  * STRICT `delete.seq > data.seq`, so re-inserts after a delete must
  * carry a higher sequence number. */
object IcebergWrite {

  /** One file in a snapshot: `content` 0 = data, 1 = position deletes,
    * 2 = equality deletes (then `equalityIds` names the field ids).
    * `partition` carries the file's IDENTITY-transform partition tuple
    * (name → Long/Int/String value) into the manifest's `partition`
    * struct — the pruning metadata real Iceberg scan planning runs on;
    * all entries of one commit must agree on the field names.
    * `sizeInBytes` lands in `file_size_in_bytes` (true lengths make the
    * pruned scan's split planning correct). */
  final case class FileEntry(path: String, content: Int, sequenceNumber: Long,
                             equalityIds: Seq[Int] = Nil,
                             partition: Seq[(String, Any)] = Nil,
                             sizeInBytes: Long = 1L,
                             /** `PARQUET`, or `PUFFIN` for a format-v3
                               * deletion-vector entry — then the three
                               * DV fields below are required. */
                             format: String = "PARQUET",
                             referencedDataFile: Option[String] = None,
                             contentOffset: Option[Long] = None,
                             contentSizeInBytes: Option[Long] = None)

  private val ManifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"manifest_length","type":"long"},
      {"name":"partition_spec_id","type":"int"},
      {"name":"sequence_number","type":"long"},
      {"name":"added_snapshot_id","type":"long"}]}""")

  /** The `r2` data_file struct; with partition fields present, a
    * `partition` record (r102) rides along — field types derived from
    * the sample values (long/int/string, nullable). */
  private def dataFileSchema(partitionSample: Seq[(String, Any)]): Schema = {
    val partitionField =
      if (partitionSample.isEmpty) ""
      else {
        val fields = partitionSample.map { case (name, v) =>
          val t = v match {
            case _: Long | _: java.lang.Long => "long"
            case _: Int | _: java.lang.Integer => "int"
            case _ => "string"
          }
          s"""{"name":"$name","type":["null","$t"],"default":null}"""
        }.mkString(",")
        s"""{"name":"partition","type":{"type":"record","name":"r102",""" +
          s""""fields":[$fields]}},"""
      }
    new Schema.Parser().parse(
      s"""{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int"},
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        $partitionField
        {"name":"record_count","type":"long"},
        {"name":"file_size_in_bytes","type":"long"},
        {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null},
        {"name":"referenced_data_file","type":["null","string"],"default":null},
        {"name":"content_offset","type":["null","long"],"default":null},
        {"name":"content_size_in_bytes","type":["null","long"],"default":null}]}""")
  }

  private def manifestEntrySchema(dataFile: Schema): Schema =
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"snapshot_id","type":["null","long"],"default":null},
        {"name":"sequence_number","type":["null","long"],"default":null},
        {"name":"data_file","type":${dataFile.toString}}]}""")

  private def writeAvro(spark: SparkSession, path: Path, schema: Schema,
                        records: Seq[GenericRecord]): Unit = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    records.foreach(w.append)
    w.close()
  }

  /** Commit one snapshot over explicit file lists. `dataFiles` are
    * content=0 entries, `posDeleteFiles` content=1 (v2 position
    * deletes). Paths should be the spelling readers will see in the
    * manifests (absolute). */
  def commit(spark: SparkSession, table: String, dataFiles: Seq[String],
             posDeleteFiles: Seq[String] = Nil, snapshotId: Long = 1L): Unit =
    commitEntries(spark, table,
      dataFiles.map(FileEntry(_, 0, snapshotId)) ++
        posDeleteFiles.map(FileEntry(_, 1, snapshotId)),
      schemaFields = Nil, snapshotId = snapshotId)

  /** Commit one snapshot of explicit [[FileEntry]]s. `schemaFields` is the
    * table schema as `(field id, name, iceberg type)` triples — required
    * when equality-delete entries are present (readers resolve
    * `equality_ids` through it).
    *
    * `inheritSnapshotId` writes entries with a NULL `snapshot_id` — what
    * real Iceberg v2 writers emit, relying on readers to inherit the
    * manifest list's `added_snapshot_id` (exercises the reader's
    * inheritance path). `operation` lands in the snapshot's
    * `summary.operation` (real writers always record one; `append` is
    * what the append-only gates accept). */
  def commitEntries(spark: SparkSession, table: String, entries: Seq[FileEntry],
                    schemaFields: Seq[(Int, String, String)],
                    snapshotId: Long = 1L,
                    timestampMs: Option[Long] = None,
                    inheritSnapshotId: Boolean = false,
                    operation: String = "append",
                    /** `(field name, transform, source field id)` triples
                      * recorded as the table's `partition-specs` (hidden
                      * partitioning — [[graft.sources.IcebergTransforms]]);
                      * empty carries any prior spec forward. */
                    partitionSpec: Seq[(String, String, Int)] = Nil): Unit = {
    require(entries.forall(e => e.content != 2 || e.equalityIds.nonEmpty),
      "equality-delete entries need equalityIds")
    require(entries.forall(e => e.content == 2 || e.equalityIds.isEmpty),
      "equalityIds only belong on content=2 entries")
    require(schemaFields.nonEmpty || entries.forall(_.content != 2),
      "equality deletes need schemaFields so readers can resolve the ids")
    require(entries.forall(e => !e.format.equalsIgnoreCase("PUFFIN") ||
        (e.content == 1 && e.referencedDataFile.isDefined &&
          e.contentOffset.isDefined && e.contentSizeInBytes.isDefined)),
      "a PUFFIN entry is a deletion vector: content=1 with " +
        "referencedDataFile/contentOffset/contentSizeInBytes set")
    require(entries.forall(e => e.referencedDataFile.isEmpty ||
        e.format.equalsIgnoreCase("PUFFIN")),
      "referencedDataFile only belongs on PUFFIN deletion-vector entries")
    val partitionNames = entries.flatMap(_.partition.map(_._1)).distinct
    require(entries.forall(e =>
        e.partition.isEmpty || e.partition.map(_._1) == partitionNames),
      "all entries of one commit must agree on the partition field names")
    // type each partition field from its first NON-NULL value across the
    // commit (a leading null must not demote a long field to string)
    val DataFileSchema = dataFileSchema(partitionNames.map { n =>
      n -> entries.flatMap(_.partition.collect {
        case (`n`, v) if v != null => v
      }).headOption.orNull
    })
    val ManifestEntrySchema = manifestEntrySchema(DataFileSchema)
    val meta = new Path(table, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(meta)
    def entry(fe: FileEntry): GenericRecord = {
      val df = new GenericData.Record(DataFileSchema)
      df.put("content", fe.content)
      df.put("file_path", fe.path)
      df.put("file_format", fe.format.toUpperCase)
      df.put("record_count", 1L)
      df.put("file_size_in_bytes", fe.sizeInBytes)
      fe.referencedDataFile.foreach(df.put("referenced_data_file", _))
      fe.contentOffset.foreach(o => df.put("content_offset", Long.box(o)))
      fe.contentSizeInBytes.foreach(l =>
        df.put("content_size_in_bytes", Long.box(l)))
      if (fe.partition.nonEmpty) {
        val pschema = DataFileSchema.getField("partition").schema
        val prec = new GenericData.Record(pschema)
        fe.partition.foreach { case (name, v) =>
          prec.put(name, v match {
            case l: Long => Long.box(l)
            case i: Int => Int.box(i)
            case null => null
            case other => other.toString
          })
        }
        df.put("partition", prec)
      }
      if (fe.content == 2) {
        val arr = new GenericData.Array[Integer](fe.equalityIds.size,
          DataFileSchema.getField("equality_ids").schema.getTypes.get(1))
        fe.equalityIds.foreach(id => arr.add(Int.box(id)))
        df.put("equality_ids", arr)
      }
      val e = new GenericData.Record(ManifestEntrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id",
        if (inheritSnapshotId) null else Long.box(snapshotId))
      e.put("sequence_number", Long.box(fe.sequenceNumber))
      e.put("data_file", df)
      e
    }
    // append-commit: an existing table contributes its snapshot history
    // and the current snapshot's manifests (carried into the new list —
    // an Iceberg manifest list is the FULL file state, not a delta)
    val mapper = graft.sources.DocPushdown.jsonMapper
    val hintPath = new Path(meta, "version-hint.text")
    val prior = if (fs.exists(hintPath)) {
      val node = graft.sources.IcebergRead.readMetadata(spark, table)
      import scala.jdk.CollectionConverters._
      val snaps = Option(node.get("snapshots")).toSeq
        .flatMap(_.elements().asScala).toSeq
      require(!snaps.exists(_.get("snapshot-id").asLong() == snapshotId),
        s"snapshot id $snapshotId already committed to $table")
      val current = Option(node.get("current-snapshot-id")).map(_.asLong())
      val manifests = current.toSeq.flatMap { cur =>
        snaps.find(_.get("snapshot-id").asLong() == cur).toSeq.flatMap { s =>
          graft.sources.IcebergRead
            .avroRecords(spark, s.get("manifest-list").asText())
            .map { m =>
              def longField(name: String): Option[Long] =
                Option(m.getSchema.getField(name))
                  .flatMap(_ => Option(m.get(name)))
                  .collect { case l: java.lang.Long => l.longValue }
              // added_snapshot_id must survive the carry-forward VERBATIM:
              // entries with a null snapshot_id inherit it, so stamping
              // the new snapshot's id would re-attribute old files to the
              // new commit and corrupt incremental reads
              (m.get("manifest_path").toString,
                longField("sequence_number").getOrElse(0L),
                longField("added_snapshot_id").getOrElse(cur))
            }
        }
      }
      // schema carry-forward: a commit WITHOUT schemaFields (position
      // deletes, plain file commits) must not strip the table schema —
      // field-id reads and eq-delete resolution of EARLIER snapshots
      // depend on it surviving the metadata rebuild
      val priorSchemas = Option(node.get("schemas")).map { ss =>
        val cur = Option(node.get("current-schema-id")).map(_.asInt()).getOrElse(0)
        s""""schemas":${mapper.writeValueAsString(ss)},"current-schema-id":$cur,"""
      }.orElse(Option(node.get("schema")).map(sn =>
        s""""schema":${mapper.writeValueAsString(sn)},"""))
      // partition-spec carry-forward AND EVOLUTION: a commit without an
      // explicit spec must not strip hidden-partitioning metadata
      // (readers prune through it); a commit whose spec matches the
      // current default carries it forward; a DIFFERENT spec is appended
      // as a new spec-id and becomes the default — Iceberg's
      // metadata-only partition evolution (files written under older
      // specs keep their tuples; the reader prunes each through its own
      // spec)
      val priorSpecs = Option(node.get("partition-specs")).map { ps =>
        val cur = Option(node.get("default-spec-id")).map(_.asInt()).getOrElse(0)
        val specsSeq = ps.elements().asScala.toSeq
        def carried =
          s""""partition-specs":${mapper.writeValueAsString(ps)},"default-spec-id":$cur,"""
        if (partitionSpec.isEmpty) carried
        else {
          val curTriples = specsSeq
            .find(s => Option(s.get("spec-id")).exists(_.asInt() == cur))
            .toSeq
            .flatMap(s => Option(s.get("fields")).toSeq
              .flatMap(_.elements().asScala))
            .map(f => (f.get("name").asText(), f.get("transform").asText(),
              f.get("source-id").asInt()))
          if (curTriples == partitionSpec) carried
          else {
            val nextId = specsSeq.flatMap(s =>
              Option(s.get("spec-id")).map(_.asInt())).maxOption.getOrElse(-1) + 1
            val maxFieldId = specsSeq
              .flatMap(s => Option(s.get("fields")).toSeq
                .flatMap(_.elements().asScala))
              .flatMap(f => Option(f.get("field-id")).map(_.asInt()))
              .maxOption.getOrElse(999)
            val fields = partitionSpec.zipWithIndex.map {
              case ((name, transform, sourceId), i) =>
                s"""{"name":"$name","transform":"$transform",""" +
                  s""""source-id":$sourceId,"field-id":${maxFieldId + 1 + i}}"""
            }.mkString(",")
            val priorRendered = specsSeq.map(mapper.writeValueAsString)
              .mkString(",")
            s""""partition-specs":[$priorRendered,""" +
              s"""{"spec-id":$nextId,"fields":[$fields]}],""" +
              s""""default-spec-id":$nextId,"""
          }
        }
      }
      // refs (tags/branches) survive every commit — a tag pins its
      // snapshot through later appends and expiry
      val priorRefs = Option(node.get("refs")).map(r =>
        s""""refs":${mapper.writeValueAsString(r)},""")
      Some((snaps.map(mapper.writeValueAsString), manifests, priorSchemas,
        priorSpecs, priorRefs,
        Option(node.get("format-version")).map(_.asInt()).getOrElse(2)))
    } else None

    val manifest = new Path(meta, s"m-$snapshotId.avro")
    writeAvro(spark, manifest, ManifestEntrySchema, entries.map(entry))
    val manifestList = new Path(meta, s"snap-$snapshotId.avro")
    def mref(path: String, seq: Long, addedBy: Long): GenericRecord = {
      val m = new GenericData.Record(ManifestListSchema)
      m.put("manifest_path", path)
      m.put("manifest_length", 1L)
      m.put("partition_spec_id", 0)
      m.put("sequence_number", seq)
      m.put("added_snapshot_id", addedBy)
      m
    }
    val newSeq = entries.map(_.sequenceNumber).maxOption.getOrElse(0L)
    writeAvro(spark, manifestList, ManifestListSchema,
      prior.toSeq.flatMap(_._2).map { case (p, s, by) => mref(p, s, by) } :+
        mref(manifest.toString, newSeq, snapshotId))
    val schemaJson =
      if (schemaFields.isEmpty)
        prior.flatMap(_._3).getOrElse("") // carry the existing schema
      else {
        val fields = schemaFields.map { case (id, name, tpe) =>
          // a primitive type is a quoted string; a raw `{...}` passes
          // through verbatim (nested struct types for equality-delete
          // fixtures)
          val t = if (tpe.trim.startsWith("{")) tpe else s""""$tpe""""
          s"""{"id":$id,"name":"$name","required":false,"type":$t}"""
        }.mkString(",")
        s""""schemas":[{"schema-id":0,"type":"struct","fields":[$fields]}],
          "current-schema-id":0,"""
      }
    val specJson = prior.flatMap(_._4) match {
      case Some(rendered) => rendered // carry-forward / evolution above
      case None =>
        if (partitionSpec.isEmpty) ""
        else {
          val fields = partitionSpec.zipWithIndex.map {
            case ((name, transform, sourceId), i) =>
              s"""{"name":"$name","transform":"$transform",""" +
                s""""source-id":$sourceId,"field-id":${1000 + i}}"""
          }.mkString(",")
          s""""partition-specs":[{"spec-id":0,"fields":[$fields]}],
            "default-spec-id":0,"""
        }
    }
    // deterministic default: the snapshot id doubles as timestamp-ms, so
    // readers' FOR TIMESTAMP AS OF works on fixture tables too
    val ts = timestampMs.getOrElse(snapshotId)
    val newSnap =
      s"""{"snapshot-id":$snapshotId,"timestamp-ms":$ts,
        "summary":{"operation":"$operation"},
        "manifest-list":"$manifestList"}"""
    val allSnaps = (prior.toSeq.flatMap(_._1) :+ newSnap).mkString(",")
    val refsJson = prior.flatMap(_._5).getOrElse("")
    // deletion vectors are a format-v3 feature; once a table is v3 it
    // stays v3 (no silent downgrade on a later DV-free commit)
    val formatVersion =
      if (entries.exists(_.referencedDataFile.isDefined) ||
          prior.exists(_._6 >= 3)) 3 else 2
    val metadataJson =
      s"""{"format-version":$formatVersion,$schemaJson$specJson$refsJson"current-snapshot-id":$snapshotId,
        "snapshots":[$allSnaps]}"""
    val priorVersion = if (fs.exists(hintPath)) {
      val in = fs.open(hintPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    } else 0L
    val version = priorVersion + 1
    val vfile = fs.create(new Path(meta, s"v$version.metadata.json"), true)
    try vfile.write(metadataJson.getBytes(UTF_8)) finally vfile.close()
    val hint = fs.create(hintPath, true)
    try hint.write(version.toString.getBytes(UTF_8)) finally hint.close()
  }

  /** HIDDEN-PARTITIONED write — Iceberg's flagship layout feature:
    * `specs` are `(partition field name, transform, source column)`
    * triples (`identity`, `day`, `hour`, `month`, `bucket[N]`,
    * `truncate[W]` over integers); rows route by the TRANSFORMED value
    * in ONE shuffled write job (`repartition` on the transform columns
    * + `partitionBy`), manifests carry the transformed tuples, and the
    * metadata records `partition-specs` so
    * [[graft.sources.IcebergRead]] prunes files through the transforms
    * ON THE SOURCE COLUMNS — `WHERE ts >= X` opens only the matching
    * day-partitions with no partition column in the query (the spec's
    * hidden-partitioning contract; source columns stay in the data
    * files). The bucket arithmetic is the SAME
    * [[graft.sources.IcebergTransforms]] code the scan prunes with, so
    * write and read can never disagree. Skips replayed snapshot ids. */
  def writeHiddenPartitioned(df: org.apache.spark.sql.DataFrame, table: String,
                             specs: Seq[(String, String, String)],
                             fields: Seq[(Int, String, String)],
                             snapshotId: Long = 1L): Boolean = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    require(specs.nonEmpty, "writeHiddenPartitioned needs at least one spec field")
    if (snapshotExists(spark, table, snapshotId)) return false
    graft.functions.IcebergPartitionFunctions.ensureRegistered(spark)
    val BucketRe = """bucket\[(\d+)\]""".r
    val TruncateRe = """truncate\[(\d+)\]""".r
    // transform column + the TYPE its directory value parses back as
    val planned = specs.zipWithIndex.map { case ((name, transform, src), i) =>
      require(df.columns.contains(src),
        s"writeHiddenPartitioned: no source column '$src' in the batch")
      val srcType = df.schema(src).dataType
      val c = col(src)
      def floorDivMicros(d: Long) =
        ((unix_micros(c) - pmod(unix_micros(c), lit(d))) / lit(d)).cast("int")
      // calendar fields of the UTC instant (year()/month() directly on a
      // timestamp use the SESSION timezone and would disagree with the
      // scan side's UTC arithmetic near boundaries)
      def utcDate = date_add(to_date(lit("1970-01-01")),
        floorDivMicros(86400L * 1000000L))
      def calDate = if (srcType == DateType) c else utcDate
      val (pc, vType): (org.apache.spark.sql.Column, DataType) = transform match {
        case "identity" => (c, srcType)
        case "day" | "days" => srcType match {
          case TimestampType => (floorDivMicros(86400L * 1000000L), IntegerType)
          case DateType => (datediff(c, to_date(lit("1970-01-01"))), IntegerType)
          case other => throw new IllegalArgumentException(
            s"day() needs a timestamp/date source, got $other")
        }
        case "hour" | "hours" =>
          require(srcType == TimestampType,
            s"hour() needs a timestamp source, got $srcType")
          (floorDivMicros(3600L * 1000000L), IntegerType)
        case "month" | "months" =>
          ((year(calDate) - lit(1970)) * lit(12) + month(calDate) - lit(1),
            IntegerType)
        case "year" | "years" => (year(calDate) - lit(1970), IntegerType)
        case BucketRe(n) =>
          (graft.functions.IcebergPartitionFunctions.icebergBucket(c, n.toInt),
            IntegerType)
        case TruncateRe(w) =>
          require(srcType == LongType || srcType == IntegerType,
            s"truncate[] write support covers integer sources, got $srcType")
          ((c - pmod(c, lit(w.toLong))).cast(srcType), srcType)
        case other => throw new IllegalArgumentException(
          s"unsupported transform '$other'")
      }
      (name, transform, src, pc, vType, s"__pt_$i")
    }
    val routed = planned.foldLeft(df) { case (d, (_, _, _, pc, _, pt)) =>
      d.withColumn(pt, pc)
    }
    val sub = s"data/hp-$snapshotId"
    routed.repartition(planned.map(p => col(p._6)): _*)
      .write.mode("errorifexists").partitionBy(planned.map(_._6): _*)
      .parquet(s"$table/$sub")
    // walk the hive-layout output: one manifest entry per file, tuple
    // values parsed back from the directory names in spec order
    val root = new Path(s"$table/$sub")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parseValue(raw: String, t: DataType): Any =
      if (raw == "__HIVE_DEFAULT_PARTITION__") null
      else t match {
        case IntegerType => raw.toInt
        case LongType => raw.toLong
        case _ => raw
      }
    val entries = scala.collection.mutable.ArrayBuffer.empty[FileEntry]
    def walk(p: Path, values: Map[String, Any]): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) n.split('=') match {
          case Array(k, v) =>
            val t = planned.find(_._6 == k).map(_._5).getOrElse(StringType)
            walk(st.getPath, values + (k -> parseValue(v, t)))
          case _ => walk(st.getPath, values)
        }
        else if (n.endsWith(".parquet"))
          entries += FileEntry(st.getPath.toString, 0, snapshotId,
            partition = planned.map(pl => pl._1 -> values.getOrElse(pl._6,
              throw new IllegalStateException(s"no ${pl._6} in layout"))),
            sizeInBytes = st.getLen)
      }
    walk(root, Map.empty)
    commitEntries(spark, table, entries.toSeq.sortBy(_.path),
      schemaFields = fields, snapshotId = snapshotId,
      partitionSpec = specs.map { case (name, transform, src) =>
        val sid = fields.find(_._2 == src).map(_._1).getOrElse(
          throw new IllegalArgumentException(
            s"source column $src not in fields"))
        (name, transform, sid)
      })
    true
  }

  /** UPSERT commit — Iceberg v2's CDC-target pattern: the batch lands
    * as new data file(s) AND an equality-delete file over the key
    * columns, both at the SAME sequence number. The spec's strict
    * `delete.seq > data.seq` scoping makes this exactly an upsert: the
    * delete kills every OLDER row with a matching key (previous
    * sequence numbers) while the batch's own rows survive. Rows are
    * deduplicated within the batch by key (last-write-wins needs a
    * precombine upstream; here: arbitrary-but-deterministic max by the
    * remaining columns is NOT applied — the caller sends one row per
    * key, checked loudly). `fields` is the full table schema as
    * (id, name, iceberg type); `keyNames` must name a subset.
    * The snapshot summary records `overwrite`, so the append-only
    * incremental/streaming gates refuse upsert history — correct:
    * upserts have no insert-only row delta. */
  def upsert(df: org.apache.spark.sql.DataFrame, table: String,
             keyNames: Seq[String], fields: Seq[(Int, String, String)],
             snapshotId: Long, sequenceNumber: Long): Boolean = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val spark = df.sparkSession
    require(keyNames.nonEmpty, "upsert needs key columns")
    if (snapshotExists(spark, table, snapshotId)) return false // replay
    val keyIds = keyNames.map(k => fields.find(_._2 == k).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"key column $k not in fields")))
    val dupes = df.groupBy(keyNames.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
    require(dupes == 0L,
      s"upsert batch carries $dupes duplicated key tuples — resolve a " +
        "precombine winner upstream (the delete file kills only OLDER " +
        "sequence numbers, in-batch duplicates would both survive)")
    val dataDir = s"$table/data/upsert-s$snapshotId"
    df.write.mode("errorifexists").parquet(dataDir)
    val delDir = s"$table/data/upsert-s$snapshotId-deletes"
    df.select(keyNames.map(col): _*).write.mode("errorifexists").parquet(delDir)
    def files(dir: String): Seq[(String, Long)] = {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => (st.getPath.toString, st.getLen))
    }
    val entries =
      files(dataDir).map { case (p, sz) =>
        FileEntry(p, 0, sequenceNumber, sizeInBytes = sz)
      } ++ files(delDir).map { case (p, sz) =>
        FileEntry(p, 2, sequenceNumber, equalityIds = keyIds, sizeInBytes = sz)
      }
    commitEntries(spark, table, entries, fields, snapshotId = snapshotId,
      operation = "overwrite")
    true
  }

  /** Is `snapshotId` already committed? The CDC-target idempotence
    * probe: [[upsert]]/[[deleteKeys]] skip replayed batches BEFORE
    * writing any file (a replay must not trip over its own prior
    * output), the Iceberg-side analog of the SetTransaction watermark. */
  def snapshotExists(spark: SparkSession, table: String,
                     snapshotId: Long): Boolean = {
    val hint = new Path(new Path(table, "metadata"), "version-hint.text")
    val fs = hint.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hint) && graft.sources.IcebergRead
      .snapshotManifests(spark, table).exists(_.id == snapshotId)
  }

  /** DELETE-ONLY commit: an equality-delete file over the key columns,
    * no data files — hard deletes for the CDC-target path ([[upsert]]'s
    * sibling; same sequence-number scoping). `df` carries one row per
    * deleted key tuple. */
  def deleteKeys(df: org.apache.spark.sql.DataFrame, table: String,
                 keyNames: Seq[String], fields: Seq[(Int, String, String)],
                 snapshotId: Long, sequenceNumber: Long): Boolean = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    require(keyNames.nonEmpty, "deleteKeys needs key columns")
    if (snapshotExists(spark, table, snapshotId)) return false // replay
    val keyIds = keyNames.map(k => fields.find(_._2 == k).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"key column $k not in fields")))
    val delDir = s"$table/data/delete-s$snapshotId"
    df.select(keyNames.map(col): _*).distinct()
      .write.mode("errorifexists").parquet(delDir)
    val p = new Path(delDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => FileEntry(st.getPath.toString, 2, sequenceNumber,
        equalityIds = keyIds, sizeInBytes = st.getLen))
    commitEntries(spark, table, entries, fields, snapshotId = snapshotId,
      operation = "delete")
    true
  }

  /** POSITION-DELETE commit — Iceberg v2's row-level DELETE WHERE
    * without rewriting a single data file: rows matching `condition`
    * in the CURRENT snapshot become `(file_path, pos)` tuples (the
    * data file's manifest spelling + the row's index in it, straight
    * from Spark's `_metadata` columns), written as position-delete
    * parquet sorted by (file_path, pos) per the spec and committed as
    * a content=1 entry. A position delete names its file by exact
    * path, so no sequence-number scoping is needed — the reader's
    * anti-join drops the rows for every later snapshot. Scale shape:
    * ONE pushdown-capable scan of the data files (the condition and
    * the two metadata columns are all that's read) and one
    * metadata-only commit; nothing row-sized touches the driver.
    * Same snapshot-id idempotence as [[upsert]]. */
  def deleteWhere(spark: SparkSession, table: String, condition: String,
                  snapshotId: Long, sequenceNumber: Long,
                  maxFiles: Int = 1000000): Boolean = {
    import org.apache.spark.sql.functions.{broadcast, col, expr}
    if (snapshotExists(spark, table, snapshotId)) return false // replay
    val files = graft.sources.IcebergRead.currentDataFiles(spark, table, maxFiles)
    if (files.isEmpty) return true // nothing to delete from
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    // _metadata.file_path spelling → the path as the manifests spell it
    // (position deletes must reference the MANIFEST spelling)
    val lookup = files.map { t =>
      val hp = new Path(t.path)
      (graft.sources.DeletionVectors.sparkPathString(
        hp.getFileSystem(conf).makeQualified(hp)), t.path)
    }.toDF("__q", "file_path")
    val matched = spark.read.parquet(files.map(_.path): _*)
      .where(expr(condition))
      .select(col("_metadata.file_path").as("__q"),
        col("_metadata.row_index").as("pos"))
      .join(broadcast(lookup), Seq("__q"))
      .select(col("file_path"), col("pos"))
    val delDir = s"$table/data/posdelete-s$snapshotId"
    // one delete file per target-file cluster, each sorted by
    // (file_path, pos) per the spec — no single-task funnel
    matched.repartition(org.apache.spark.sql.functions.col("file_path"))
      .sortWithinPartitions("file_path", "pos")
      .write.mode("errorifexists").parquet(delDir)
    val p = new Path(delDir)
    val fs = p.getFileSystem(conf)
    val entries = fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => FileEntry(st.getPath.toString, 1, sequenceNumber,
        sizeInBytes = st.getLen))
    commitEntries(spark, table, entries, schemaFields = Nil,
      snapshotId = snapshotId, operation = "delete")
    true
  }

  /** Row-level DELETE WHERE written as format-v3 DELETION VECTORS
    * (Iceberg spec v3; [[graft.sources.Puffin]]): each affected data
    * file's matched row positions become ONE `deletion-vector-v1` blob
    * in a puffin file, committed as a content=1 manifest entry carrying
    * `referenced_data_file` / `content_offset` / `content_size_in_bytes`
    * (manifest field ids 143–145 in the real schema) — the v3
    * replacement for v2 position-delete parquet. The commit flips the
    * table's `format-version` to 3.
    *
    * Scale shape mirrors [[graft.sources.DeletionVectors
    * .writeFilesDistributed]]: ONE pushdown-capable scan of the data
    * files evaluates the condition, positions shuffle to their file's
    * group, and each EXECUTOR task serializes + writes its files'
    * puffin sidecars — the driver sees only blob descriptors (bounded
    * by affected-FILE count), never row positions. A file's bitmap is
    * the unit of work, exactly Delta's DV writer contract.
    *
    * Accumulation: a later DV delete adds new blobs referencing the
    * same data files; [[graft.sources.IcebergRead]] unions all DVs per
    * file (set semantics — v3's "latest DV supersedes" compaction is a
    * maintenance concern this writer does not need, since blobs here
    * are disjoint position sets). Same snapshot-id idempotence as
    * [[upsert]]. */
  def deleteWhereDv(spark: SparkSession, table: String, condition: String,
                    snapshotId: Long, sequenceNumber: Long,
                    maxFiles: Int = 1000000): Boolean = {
    import org.apache.spark.sql.functions.{broadcast, col, collect_set, expr, sort_array}
    if (snapshotExists(spark, table, snapshotId)) return false // replay
    val files = graft.sources.IcebergRead.currentDataFiles(spark, table, maxFiles)
    if (files.isEmpty) return true
    val conf = spark.sparkContext.hadoopConfiguration
    import spark.implicits._
    val lookup = files.map { t =>
      val hp = new Path(t.path)
      (graft.sources.DeletionVectors.sparkPathString(
        hp.getFileSystem(conf).makeQualified(hp)), t.path)
    }.toDF("__q", "file_path")
    val matched = spark.read.parquet(files.map(_.path): _*)
      .where(expr(condition))
      .select(col("_metadata.file_path").as("__q"),
        col("_metadata.row_index").as("pos"))
      .join(broadcast(lookup), Seq("__q"))
      .select(col("file_path"), col("pos"))
    import scala.jdk.CollectionConverters._
    val props = spark.sparkContext.broadcast(
      conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray)
    val dvDir = s"$table/data"
    val written = matched
      .groupBy(col("file_path"))
      .agg(sort_array(collect_set(col("pos"))).as("__ps"))
      .as[(String, Seq[Long])]
      .rdd.mapPartitions { it =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        props.value.foreach { case (k, v) => c.set(k, v) }
        it.map { case (refFile, ps) =>
          val puffin = new Path(dvDir,
            s"dv-s$snapshotId-${java.util.UUID.randomUUID()}.puffin")
          val blobs = graft.sources.Puffin.writeDvFile(c, puffin,
            Seq(refFile -> ps), snapshotId, sequenceNumber)
          val size = puffin.getFileSystem(c).getFileStatus(puffin).getLen
          (puffin.toString, blobs.head, size)
        }
      }
      .collect().toSeq.sortBy(_._1)
    // zero matches still commits an (empty) snapshot, so the
    // snapshot-id replay guard keeps working
    val entries = written.map { case (path, blob, size) =>
      FileEntry(path, 1, sequenceNumber, sizeInBytes = size,
        format = "PUFFIN",
        referencedDataFile = Some(blob.referencedDataFile),
        contentOffset = Some(blob.offset),
        contentSizeInBytes = Some(blob.length))
    }
    commitEntries(spark, table, entries, schemaFields = Nil,
      snapshotId = snapshotId, operation = "delete")
    true
  }

  /** SCHEMA-EVOLUTION commit: a new metadata version whose CURRENT
    * schema is `schemaFields`, snapshots carried forward untouched —
    * the rename / add-column shape (same field id + new name = rename;
    * fresh id = new column; Iceberg never reuses ids). Readers resolve
    * old data files through the ids, so a rename is metadata-only.
    * Caveat (fixture-grade, like the rest of this writer): a later
    * [[commitEntries]] rebuilds the schema from ITS `schemaFields` —
    * pass the evolved schema on subsequent commits. */
  /** Set a REF — Iceberg's named snapshot pointer (`refs` in the table
    * metadata): `type=tag` pins a snapshot immutably ("the v1.0
    * training set"), `type=branch` is a movable head. Metadata-only
    * commit; refs survive later appends (carry-forward in
    * [[commitEntries]]) and pin their snapshots through
    * [[IcebergExpire.expireSnapshots]]. Read back via
    * [[graft.sources.IcebergRead.snapshotAtRef]]. */
  def setRef(spark: SparkSession, table: String, name: String,
             snapshotId: Long, refType: String = "tag"): Unit = {
    require(Seq("tag", "branch").contains(refType),
      s"refType must be tag|branch, got '$refType'")
    require(name.nonEmpty, "ref name required")
    val meta = new Path(table, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hintPath = new Path(meta, "version-hint.text")
    require(fs.exists(hintPath), s"$table has no Iceberg metadata")
    val mapper = graft.sources.DocPushdown.jsonMapper
    val node = graft.sources.IcebergRead.readMetadata(spark, table)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    import scala.jdk.CollectionConverters._
    val exists = Option(node.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .exists(_.get("snapshot-id").asLong() == snapshotId)
    require(exists, s"snapshot $snapshotId not in $table's metadata")
    val refs = Option(node.get("refs"))
      .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
      .getOrElse(node.putObject("refs"))
    Option(refs.get(name)).foreach { r =>
      require(r.get("type").asText() != "tag",
        s"ref '$name' is a TAG — tags are immutable; drop it first")
    }
    val r = mapper.createObjectNode()
    r.put("snapshot-id", snapshotId)
    r.put("type", refType)
    refs.set[com.fasterxml.jackson.databind.JsonNode](name, r)
    node.set[com.fasterxml.jackson.databind.JsonNode]("refs", refs)
    bumpMetadata(fs, meta, hintPath, mapper.writeValueAsString(node))
  }

  /** ROLLBACK to an earlier snapshot — Iceberg's
    * `rollback_to_snapshot`: `current-snapshot-id` moves back to
    * `snapshotId` (which must still be in the metadata); later
    * snapshots STAY in history until expiry, so the rollback itself is
    * reversible with another rollback. Metadata-only. */
  def rollback(spark: SparkSession, table: String, snapshotId: Long): Unit = {
    val meta = new Path(table, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hintPath = new Path(meta, "version-hint.text")
    require(fs.exists(hintPath), s"$table has no Iceberg metadata")
    val mapper = graft.sources.DocPushdown.jsonMapper
    val node = graft.sources.IcebergRead.readMetadata(spark, table)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    import scala.jdk.CollectionConverters._
    require(Option(node.get("snapshots")).toSeq
        .flatMap(_.elements().asScala)
        .exists(_.get("snapshot-id").asLong() == snapshotId),
      s"snapshot $snapshotId not in $table's metadata (expired?)")
    node.put("current-snapshot-id", snapshotId)
    bumpMetadata(fs, meta, hintPath, mapper.writeValueAsString(node))
  }

  /** Remove a ref (required before re-tagging — tags are immutable). */
  def dropRef(spark: SparkSession, table: String, name: String): Unit = {
    val meta = new Path(table, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hintPath = new Path(meta, "version-hint.text")
    require(fs.exists(hintPath), s"$table has no Iceberg metadata")
    val mapper = graft.sources.DocPushdown.jsonMapper
    val node = graft.sources.IcebergRead.readMetadata(spark, table)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val refs = Option(node.get("refs"))
      .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
      .getOrElse(throw new IllegalArgumentException(s"$table has no refs"))
    require(refs.has(name), s"no ref '$name' on $table")
    refs.remove(name)
    bumpMetadata(fs, meta, hintPath, mapper.writeValueAsString(node))
  }

  private def bumpMetadata(fs: org.apache.hadoop.fs.FileSystem, meta: Path,
                           hintPath: Path, json: String): Unit = {
    val in = fs.open(hintPath)
    val prior = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      .trim.toLong finally in.close()
    val version = prior + 1
    val vfile = fs.create(new Path(meta, s"v$version.metadata.json"), true)
    try vfile.write(json.getBytes(UTF_8)) finally vfile.close()
    val hint = fs.create(hintPath, true)
    try hint.write(version.toString.getBytes(UTF_8)) finally hint.close()
  }

  def updateSchema(spark: SparkSession, table: String,
                   schemaFields: Seq[(Int, String, String)]): Unit = {
    require(schemaFields.nonEmpty, "updateSchema needs fields")
    val meta = new Path(table, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hintPath = new Path(meta, "version-hint.text")
    require(fs.exists(hintPath), s"$table has no Iceberg metadata to evolve")
    val mapper = graft.sources.DocPushdown.jsonMapper
    val node = graft.sources.IcebergRead.readMetadata(spark, table)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val newId = Option(node.get("current-schema-id")).map(_.asInt()).getOrElse(0) + 1
    val schemaNode = mapper.createObjectNode()
    schemaNode.put("schema-id", newId)
    schemaNode.put("type", "struct")
    val arr = schemaNode.putArray("fields")
    schemaFields.foreach { case (id, name, tpe) =>
      val f = arr.addObject()
      f.put("id", id)
      f.put("name", name)
      f.put("required", false)
      if (tpe.trim.startsWith("{"))
        f.set[com.fasterxml.jackson.databind.JsonNode]("type", mapper.readTree(tpe))
      else f.put("type", tpe)
    }
    val schemas = mapper.createArrayNode()
    schemas.add(schemaNode)
    node.set[com.fasterxml.jackson.databind.JsonNode]("schemas", schemas)
    node.put("current-schema-id", newId)
    val in = fs.open(hintPath)
    val prior = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
                finally in.close()
    val version = prior + 1
    val vfile = fs.create(new Path(meta, s"v$version.metadata.json"), true)
    try vfile.write(mapper.writeValueAsString(node).getBytes(UTF_8))
    finally vfile.close()
    val hint = fs.create(hintPath, true)
    try hint.write(version.toString.getBytes(UTF_8)) finally hint.close()
  }
}
