package graft.sources

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
  *    `_metadata.file_path` / `_metadata.row_index`. A position delete
  *    names its data file by exact path, so it can never hit a file added
  *    later (paths are unique) — no sequence scoping needed.
  *  - v2 EQUALITY deletes (`data_file.content` = 2) are MERGED with the
  *    spec's sequence-number scoping: a delete row kills a data row iff
  *    the delete file's data sequence number is STRICTLY GREATER than the
  *    data file's (rows re-inserted after the delete survive). Matching
  *    is null-safe equality over the delete file's `equality_ids`,
  *    resolved to STRUCT PATHS through the table metadata's schema
  *    (field id → path — nested struct fields included). Per-entry
  *    sequence numbers inherit from the manifest list when null, per
  *    the v2 inheritance rule.
  *
  * Scale notes: the driver reads the metadata JSON and manifest LISTS
  * (small — one record per manifest); the MANIFESTS themselves parse
  * EXECUTOR-PARALLEL once a snapshot has more than a handful (wall-time
  * bounded by manifests/parallelism, like real Iceberg clients — probed
  * at 64 manifests in [[graft.ScaleProbe]]). Entry state is bounded by
  * `maxFiles`; the data path is one parquet scan with pushdown/pruning
  * intact, and each delete class adds one anti join whose build side is
  * the delete files' own scan — nothing else is materialized on the
  * driver. */
object IcebergRead {

  private def mapper = DocPushdown.jsonMapper

  /** A snapshot file with its data sequence number, plus the manifest's
    * partition tuple and file size when recorded (pruning metadata). */
  private[graft] final case class Tracked(path: String, seq: Long,
                                          partition: Seq[(String, Any)] = Nil,
                                          size: Long = -1L,
                                          /** Set on a format-v3 DELETION
                                            * VECTOR entry: the referenced
                                            * data file (manifest spelling)
                                            * and the blob's (offset,
                                            * length) in the puffin file at
                                            * `path`. */
                                          dv: Option[(String, Long, Long)] = None)
  /** Equality-delete files sharing one `equality_ids` list. */
  private[graft] final case class EqGroup(fieldIds: Seq[Int], files: Seq[Tracked])

  /** Resolve the current metadata file: `version-hint.text` if present
    * (Hadoop tables), else the highest `vN.metadata.json`. */
  private[graft] def metadataFile(spark: SparkSession, table: String): Path = {
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
  private[graft] def avroRecords(spark: SparkSession, path: String): Seq[GenericRecord] =
    avroRecordsConf(spark.sparkContext.hadoopConfiguration, path)

  private def avroRecordsConf(conf: org.apache.hadoop.conf.Configuration,
                              path: String): Seq[GenericRecord] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val stream = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (stream.hasNext) out += stream.next()
      out.toSeq
    } finally { stream.close(); in.close() }
  }

  private def optField(r: GenericRecord, name: String): Option[AnyRef] =
    Option(r.getSchema.getField(name)).flatMap(_ => Option(r.get(name)))

  /** One `manifest_entry`, flattened to a serializable shape so manifest
    * parsing can run on EXECUTORS. */
  private[graft] final case class RawEntry(status: Int, content: Int, path: String,
                                    seq: Option[Long],
                                    entrySnapshotId: Option[Long],
                                    equalityIds: Seq[Int], format: String,
                                    partition: Seq[(String, Any)] = Nil,
                                    size: Long = -1L,
                                    referencedDataFile: Option[String] = None,
                                    contentOffset: Option[Long] = None,
                                    contentSize: Option[Long] = None)

  private def parseManifest(conf: org.apache.hadoop.conf.Configuration,
                            manifestPath: String): Seq[RawEntry] =
    avroRecordsConf(conf, manifestPath).map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      import scala.jdk.CollectionConverters._
      val ids = optField(df, "equality_ids").map {
        case l: java.util.List[_] => // incl. GenericData.Array
          l.asScala.map(_.asInstanceOf[Number].intValue).toSeq
        case other => throw new IllegalStateException(
          s"unexpected equality_ids representation ${other.getClass.getName}")
      }.getOrElse(Seq.empty)
      // the manifest's partition tuple (r102): identity-transform values
      // for file pruning — Utf8 → String, numbers kept as Long/Int
      val partition: Seq[(String, Any)] =
        optField(df, "partition").toSeq.flatMap {
          case r: GenericRecord =>
            r.getSchema.getFields.asScala.toSeq.map { f =>
              f.name -> (r.get(f.name) match {
                case null => null
                case l: java.lang.Long => l.longValue
                case i: java.lang.Integer => i.intValue
                case other => other.toString
              })
            }
          case _ => Nil
        }
      RawEntry(
        e.get("status").asInstanceOf[Int],
        optField(df, "content").map(_.asInstanceOf[Int]).getOrElse(0),
        df.get("file_path").toString,
        optField(e, "sequence_number")
          .collect { case l: java.lang.Long => l.longValue },
        Option(e.get("snapshot_id")).collect { case n: Number => n.longValue },
        ids,
        df.get("file_format").toString,
        partition,
        optField(df, "file_size_in_bytes")
          .collect { case l: java.lang.Long => l.longValue }.getOrElse(-1L),
        optField(df, "referenced_data_file").map(_.toString),
        optField(df, "content_offset")
          .collect { case l: java.lang.Long => l.longValue },
        optField(df, "content_size_in_bytes")
          .collect { case l: java.lang.Long => l.longValue })
    }

  /** Parse many manifests — serially for a handful, EXECUTOR-PARALLEL
    * beyond that (ship the hadoop conf as plain props, one task per
    * manifest): a snapshot with thousands of manifests pays
    * manifests/parallelism wall-time instead of a serial driver loop,
    * the same shape as [[HudiRead.listAllFiles]]. */
  private[graft] def parseManifests(spark: SparkSession, paths: Seq[String])
      : Map[String, Seq[RawEntry]] = {
    val distinct = paths.distinct
    if (distinct.size <= 8) {
      val conf = spark.sparkContext.hadoopConfiguration
      distinct.map(p => p -> parseManifest(conf, p)).toMap
    } else {
      import scala.jdk.CollectionConverters._
      val props = spark.sparkContext.broadcast(
        spark.sparkContext.hadoopConfiguration.iterator().asScala
          .map(e => (e.getKey, e.getValue)).toArray)
      spark.sparkContext
        .parallelize(distinct, math.min(distinct.size,
          spark.sparkContext.defaultParallelism * 2))
        .map { p =>
          val conf = new org.apache.hadoop.conf.Configuration(false)
          props.value.foreach { case (k, v) => conf.set(k, v) }
          p -> parseManifest(conf, p)
        }.collect().toMap
    }
  }

  /** Data, position-delete, and equality-delete files of one snapshot,
    * each with its data sequence number (entry-level, inheriting from the
    * manifest list entry when null — the v2 inheritance rule). */
  private[graft] def snapshotFiles(spark: SparkSession, manifestList: String,
                                   maxFiles: Int): (Seq[Tracked], Seq[Tracked], Seq[EqGroup]) = {
    val manifests = avroRecords(spark, manifestList).map { m =>
      val seq = optField(m, "sequence_number")
        .collect { case l: java.lang.Long => l.longValue }.getOrElse(0L)
      (m.get("manifest_path").toString, seq)
    }
    val parsed = parseManifests(spark, manifests.map(_._1))
    val data = scala.collection.mutable.ArrayBuffer.empty[Tracked]
    val posDeletes = scala.collection.mutable.ArrayBuffer.empty[Tracked]
    val eqDeletes = scala.collection.mutable.ArrayBuffer.empty[(Seq[Int], Tracked)]
    manifests.foreach { case (m, manifestSeq) =>
      parsed(m).foreach { entry =>
        if (entry.status != 2) { // 2 = DELETED entry
          val seq = entry.seq.getOrElse(manifestSeq)
          val isDv = entry.content == 1 && entry.referencedDataFile.isDefined
          require(entry.format.equalsIgnoreCase("PARQUET") ||
              (isDv && entry.format.equalsIgnoreCase("PUFFIN")),
            s"unsupported Iceberg file format ${entry.format}")
          val dv =
            if (isDv) {
              require(entry.contentOffset.isDefined && entry.contentSize.isDefined,
                s"deletion-vector entry ${entry.path} lacks content_offset/" +
                  "content_size_in_bytes")
              Some((entry.referencedDataFile.get, entry.contentOffset.get,
                entry.contentSize.get))
            } else None
          val tracked = Tracked(entry.path, seq, entry.partition, entry.size, dv)
          entry.content match {
            case 0 => data += tracked
            case 1 => posDeletes += tracked
            case 2 =>
              require(entry.equalityIds.nonEmpty,
                s"equality-delete file ${tracked.path} has no equality_ids")
              eqDeletes += ((entry.equalityIds, tracked))
            case other => throw new IllegalArgumentException(
              s"unknown Iceberg data_file.content=$other in $m")
          }
        }
      }
    }
    val total = data.size + posDeletes.size + eqDeletes.size
    require(total <= maxFiles, s"snapshot lists $total files > maxFiles=$maxFiles")
    val groups = eqDeletes.toSeq.groupBy(_._1).toSeq
      .map { case (ids, fs) => EqGroup(ids, fs.map(_._2)) }
    (data.toSeq, posDeletes.toSeq, groups)
  }

  /** Snapshot ids available for time travel, ascending by sequence. */
  def snapshots(spark: SparkSession, table: String): Seq[Long] = {
    val meta = readMetadata(spark, table)
    import scala.jdk.CollectionConverters._
    Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala.map(_.get("snapshot-id").asLong()))
  }

  /** One [[snapshotsMeta]] row: snapshot id, commit timestamp (absent in
    * non-standard metadata), `summary.operation`, and the snapshot's
    * FULL file state counts (a manifest list is the complete state, not
    * a delta). */
  final case class SnapshotInfo(snapshot_id: Long,
                                timestamp_ms: Option[Long],
                                operation: String,
                                data_files: Long, delete_files: Long)

  /** The `snapshots` metadata table — Iceberg's history/observability
    * surface, one row per snapshot in commit order. File counts come
    * from each snapshot's manifest list (executor-parallel beyond a
    * handful of manifests, like the scan path). SQL spelling:
    * `SELECT * FROM graft_iceberg_snapshots('/t')`. */
  def snapshotsMeta(spark: SparkSession, table: String,
                    maxFiles: Int = 1000000): DataFrame = {
    val meta = readMetadata(spark, table)
    import scala.jdk.CollectionConverters._
    val tsById = Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .flatMap(s => Option(s.get("timestamp-ms"))
        .map(ts => s.get("snapshot-id").asLong() -> ts.asLong())).toMap
    val rows = snapshotManifests(spark, table).map { r =>
      val (data, pos, eq) = snapshotFiles(spark, r.manifestList, maxFiles)
      SnapshotInfo(r.id, tsById.get(r.id), r.operation.orNull,
        data.size.toLong, (pos.size + eq.map(_.files.size).sum).toLong)
    }
    spark.createDataFrame(rows)
  }

  /** The snapshot current as of `tsMillis` — Iceberg's FOR TIMESTAMP AS
    * OF: the newest snapshot whose `timestamp-ms` is ≤ the wanted time.
    * Snapshots without a `timestamp-ms` (non-standard metadata) are not
    * time-travelable and are skipped. */
  def snapshotIdAtTimestamp(spark: SparkSession, table: String,
                            tsMillis: Long): Long = {
    val meta = readMetadata(spark, table)
    import scala.jdk.CollectionConverters._
    val stamped = Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .flatMap(s => Option(s.get("timestamp-ms"))
        .map(ts => (s.get("snapshot-id").asLong(), ts.asLong())))
    stamped.filter(_._2 <= tsMillis).sortBy(s => (s._2, s._1))
      .lastOption.map(_._1).getOrElse(
        throw new IllegalArgumentException(
          s"no Iceberg snapshot at or before timestamp $tsMillis" +
            (if (stamped.isEmpty) " (no snapshot carries timestamp-ms)"
             else s" (earliest is ${stamped.map(_._2).min})")))
  }

  /** Snapshot current as of `tsMillis`. */
  def snapshotAt(spark: SparkSession, table: String, tsMillis: Long,
                 maxFiles: Int = 1000000): DataFrame =
    snapshot(spark, table,
      snapshotId = Some(snapshotIdAtTimestamp(spark, table, tsMillis)),
      maxFiles = maxFiles)

  /** INCREMENTAL APPEND SCAN — Iceberg's incremental read contract: the
    * rows of data files ADDED by the snapshots after `fromSnapshotId` up
    * to `toSnapshotId` (default: current), exclusive..inclusive. Only
    * pure appends are expressible as a row-level delta, so any snapshot
    * in the range that DELETES (a status-2 entry, or a delete file added
    * in range) fails loudly instead of silently replaying partial
    * history. The scan reads exactly the appended files — never the
    * table. */
  /** One metadata `snapshots` entry: id, manifest list, and the summary
    * `operation` when the writer recorded one (real Iceberg writers
    * always do; the spec makes `summary` optional). */
  private[graft] final case class SnapshotRef(id: Long, manifestList: String,
                                              operation: Option[String])

  /** Snapshot refs in metadata (= commit) order. */
  private[graft] def snapshotManifests(spark: SparkSession, table: String)
      : Seq[SnapshotRef] = {
    val meta = readMetadata(spark, table)
    import scala.jdk.CollectionConverters._
    Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala).toSeq
      .map(s => SnapshotRef(s.get("snapshot-id").asLong(),
        s.get("manifest-list").asText(),
        Option(s.get("summary")).flatMap(n => Option(n.get("operation")))
          .map(_.asText())))
  }

  /** `(snapshot-id, data-file path)` pairs appended by exactly the given
    * snapshots; throws on any delete in the slice — a non-append history
    * has no insert-only row delta. Two delete detectors compose:
    *  - `summary.operation` ≠ `append` (a delete/overwrite/replace
    *    snapshot may express itself purely by DROPPING manifests from
    *    its manifest list — no status-2 entry, no delete file — so the
    *    entry-level checks alone would silently miss it);
    *  - entry-level: a status-2 (DELETED) entry or an added delete file
    *    attributed to an in-range snapshot (covers summaries-free
    *    metadata from non-standard writers).
    * Entry attribution follows the v2 inheritance rule: an entry with a
    * null `snapshot_id` (what real Iceberg v2 writers emit) inherits the
    * manifest-list record's `added_snapshot_id`. */
  private[graft] def appendedBySnapshots(spark: SparkSession,
                                         snaps: Seq[SnapshotRef])
      : Seq[(Long, String)] = {
    snaps.foreach { s =>
      s.operation.filterNot(_ == "append").foreach { op =>
        throw new IllegalArgumentException(
          s"snapshot ${s.id} has summary.operation=$op — the history is " +
            "not append-only, incremental read cannot express it as inserts")
      }
    }
    // manifest lists are small (one record per manifest) — read them on
    // the driver; the MANIFESTS (where the entry volume is) parse
    // executor-parallel across the whole slice
    val lists = snaps.map { s =>
      s.id -> avroRecords(spark, s.manifestList).map { m =>
        (m.get("manifest_path").toString,
          optField(m, "added_snapshot_id")
            .collect { case n: Number => n.longValue })
      }
    }
    val parsed = parseManifests(spark, lists.flatMap(_._2.map(_._1)))
    val added = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    lists.foreach { case (sid, manifests) =>
      manifests.foreach { case (m, addedSnapshotId) =>
        parsed(m).foreach { e =>
          val entrySnap = e.entrySnapshotId.orElse(addedSnapshotId)
          val inThis = entrySnap.contains(sid)
          if (inThis && e.status == 2) throw new IllegalArgumentException(
            s"snapshot $sid deletes files — the history is " +
              "not append-only, incremental read cannot express it " +
              "as inserts")
          if (inThis && e.status == 1) {
            if (e.content != 0) throw new IllegalArgumentException(
              s"snapshot $sid adds a delete file (content=${e.content}) — " +
                "the history is not append-only")
            added += ((sid, e.path))
          }
        }
      }
    }
    added.toSeq.distinct
  }

  /** One row-level change file: a data file ("insert" for append
    * snapshots, "upsert" for overwrite/delete ones) or an added
    * equality-delete file ("delete" — its rows are the delete-key
    * tuples). */
  private[graft] final case class ChangeFile(snapshotId: Long, path: String,
                                             changeClass: String)

  /** Row-level CHANGE FILES of exactly `snaps`, each diffed against its
    * predecessor's manifest list — the CHANGELOG contract that makes
    * upsert/delete histories (equality-delete commits like
    * [[graft.sink.IcebergWrite.upsert]]'s) tailable: a snapshot may only
    * ADD manifests, and its added files net into per-class change rows
    *  - data file in an `append` snapshot        → `insert`
    *  - data file in an overwrite/delete snapshot → `upsert`
    *  - equality-delete file                      → `delete`
    * (delete + upsert of one key at the same snapshot = the upsert wins,
    * exactly the equality-delete scoping `delete.seq > data.seq` — a
    * version-ranked latest-per-key election downstream reproduces it).
    * Loud failures — histories with NO row-level change representation:
    * a snapshot that DROPS a manifest (rewrite/compaction/expiry), a
    * status-2 (DELETED) entry, or a POSITION-delete file (its rows
    * address file offsets, not keys). */
  private[graft] def changedBySnapshots(spark: SparkSession,
                                        prev: Option[SnapshotRef],
                                        snaps: Seq[SnapshotRef])
      : Seq[ChangeFile] = {
    if (snaps.isEmpty) return Nil
    // manifest lists are driver-small (one record per manifest); the
    // manifests parse executor-parallel across the whole slice
    def listOf(s: SnapshotRef): Seq[(String, Option[Long])] =
      avroRecords(spark, s.manifestList).map { m =>
        (m.get("manifest_path").toString,
          optField(m, "added_snapshot_id")
            .collect { case n: Number => n.longValue })
      }
    val lists = snaps.map(s => s -> listOf(s))
    var prevPaths: Set[String] = prev.map(listOf(_).map(_._1).toSet)
      .getOrElse(Set.empty)
    val newManifests = lists.map { case (s, list) =>
      val cur = list.map(_._1).toSet
      val dropped = prevPaths -- cur
      if (dropped.nonEmpty) throw new IllegalArgumentException(
        s"snapshot ${s.id} drops manifest(s) ${dropped.mkString(", ")} — a " +
          "rewrite/compaction has no row-level change representation; " +
          "resume the changelog from a snapshot at or after it")
      val added = list.filterNot { case (p, _) => prevPaths.contains(p) }
      prevPaths = cur
      (s, added)
    }
    val parsed = parseManifests(spark,
      newManifests.flatMap(_._2.map(_._1)))
    newManifests.flatMap { case (s, manifests) =>
      val op = s.operation.getOrElse("append")
      manifests.flatMap { case (m, addedSnapshotId) =>
        parsed(m).flatMap { e =>
          val entrySnap = e.entrySnapshotId.orElse(addedSnapshotId)
          if (!entrySnap.contains(s.id)) None // carried entry
          else if (e.status == 2) throw new IllegalArgumentException(
            s"snapshot ${s.id} deletes file ${e.path} (status=2) — no " +
              "row-level change representation")
          else if (e.status != 1) None // EXISTING carry-over
          else e.content match {
            case 0 => Some(ChangeFile(s.id, e.path,
              if (op == "append") "insert" else "upsert"))
            case 2 => Some(ChangeFile(s.id, e.path, "delete"))
            case 1 => throw new IllegalArgumentException(
              s"snapshot ${s.id} adds POSITION-delete file ${e.path} — " +
                "position deletes address file offsets, not keys; the " +
                "changelog cannot express them as row changes")
            case other => throw new IllegalArgumentException(
              s"unknown Iceberg data_file.content=$other in $m")
          }
        }
      }
    }
  }

  /** BATCH changelog scan over `(fromSnapshotId, toSnapshotId]` (None =
    * from the beginning / to the current tip): one typed row per change —
    * `(version = snapshot id, change_type insert|upsert|delete, data
    * columns)`, delete rows carrying their equality-delete key columns
    * (everything else null). One pushdown-capable scan per (snapshot,
    * change-class) group — O(snapshots × classes) scans, never per-file
    * jobs (the same bounded shape as the Delta CDF reader). */
  def changelog(spark: SparkSession, table: String,
                fromSnapshotId: Option[Long] = None,
                toSnapshotId: Option[Long] = None,
                maxFiles: Int = 1000000): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val meta = readMetadata(spark, table)
    val snaps = snapshotManifests(spark, table)
    require(snaps.nonEmpty, s"$table has no snapshots")
    val fromIdx = fromSnapshotId.map { id =>
      val i = snaps.indexWhere(_.id == id)
      require(i >= 0, s"fromSnapshotId $id not in metadata")
      i
    }.getOrElse(-1)
    val toIdx = toSnapshotId.map { id =>
      val i = snaps.indexWhere(_.id == id)
      require(i >= 0, s"toSnapshotId $id not in metadata")
      i
    }.getOrElse(snaps.size - 1)
    require(toIdx >= fromIdx, "toSnapshotId precedes fromSnapshotId")
    val prev = if (fromIdx >= 0) Some(snaps(fromIdx)) else None
    val changes = changedBySnapshots(spark, prev,
      snaps.slice(fromIdx + 1, toIdx + 1))
    require(changes.size <= maxFiles,
      s"changelog range holds ${changes.size} files > maxFiles=$maxFiles")
    if (changes.isEmpty) return spark.emptyDataFrame
    val frames = changes.groupBy(c => (c.snapshotId, c.changeClass)).toSeq
      .sortBy { case ((sid, cls), _) => (sid, cls) }
      .map { case ((sid, cls), fs) =>
        dataScan(spark, fs.map(_.path), meta)
          .withColumn("version", lit(sid))
          .withColumn("change_type", lit(cls))
      }
    val unioned = frames.reduce(_.unionByName(_, allowMissingColumns = true))
    val dataCols = unioned.columns.toSeq
      .filterNot(c => c == "version" || c == "change_type")
    unioned.select((Seq("version", "change_type") ++ dataCols).map(col): _*)
  }

  def incremental(spark: SparkSession, table: String, fromSnapshotId: Long,
                  toSnapshotId: Option[Long] = None,
                  maxFiles: Int = 1000000): DataFrame = {
    val snaps = snapshotManifests(spark, table)
    val fromIdx = snaps.indexWhere(_.id == fromSnapshotId)
    require(fromIdx >= 0, s"fromSnapshotId $fromSnapshotId not in metadata")
    val toId = toSnapshotId.getOrElse {
      Option(readMetadata(spark, table).get("current-snapshot-id"))
        .map(_.asLong()).getOrElse(throw new IllegalArgumentException(
          "metadata has no current-snapshot-id"))
    }
    val toIdx = snaps.indexWhere(_.id == toId)
    require(toIdx >= 0, s"toSnapshotId $toId not in metadata")
    require(toIdx >= fromIdx,
      s"toSnapshotId $toId precedes fromSnapshotId $fromSnapshotId")
    val added = appendedBySnapshots(spark, snaps.slice(fromIdx + 1, toIdx + 1))
      .map(_._2)
    require(added.size <= maxFiles,
      s"incremental range adds ${added.size} files > maxFiles=$maxFiles")
    if (added.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(added: _*)
  }

  private[graft] def readMetadata(spark: SparkSession, table: String) = {
    val p = metadataFile(spark, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    mapper.readTree(json)
  }

  /** Field id → STRUCT PATH from the table metadata: v2 `schemas` +
    * `current-schema-id`, falling back to the v1 single `schema`.
    * Struct nesting is walked recursively (equality deletes may name
    * nested struct fields — a path like `meta.zip`); list-element and
    * map key/value ids are not addressable by an equality delete and
    * stay unmapped (loud at resolution). */
  /** The table's CURRENT schema node: v2 `schemas` + `current-schema-id`,
    * falling back to the v1 single `schema`. */
  private def currentSchemaNode(meta: com.fasterxml.jackson.databind.JsonNode)
      : Option[com.fasterxml.jackson.databind.JsonNode] = {
    import scala.jdk.CollectionConverters._
    Option(meta.get("schemas")).flatMap { ss =>
      val want = Option(meta.get("current-schema-id")).map(_.asInt())
      val all = ss.elements().asScala.toSeq
      want.flatMap(id => all.find(s =>
        Option(s.get("schema-id")).exists(_.asInt() == id)))
        .orElse(all.lastOption)
    }.orElse(Option(meta.get("schema")))
  }

  private def schemaFieldPaths(meta: com.fasterxml.jackson.databind.JsonNode)
      : Map[Int, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val schema = currentSchemaNode(meta)
    val out = scala.collection.mutable.Map.empty[Int, Seq[String]]
    def walk(fields: Seq[com.fasterxml.jackson.databind.JsonNode],
             prefix: Seq[String]): Unit =
      fields.foreach { f =>
        for (id <- Option(f.get("id")); name <- Option(f.get("name"))) {
          val path = prefix :+ name.asText()
          out(id.asInt()) = path
          Option(f.get("type")).filter(_.isObject).foreach { t =>
            if (Option(t.get("type")).exists(_.asText() == "struct"))
              walk(Option(t.get("fields")).toSeq
                .flatMap(_.elements().asScala), path)
          }
        }
      }
    walk(schema.toSeq.flatMap(s => Option(s.get("fields")).toSeq
      .flatMap(_.elements().asScala)), Nil)
    out.toMap
  }

  /** Field id → CURRENT name (path leaf) from the table schema — the
    * `graft-iceberg` json tail's rename map: files written before a
    * rename carry the old name in their footers, and the tail must emit
    * the current one. */
  private[graft] def fieldIdNames(spark: SparkSession, table: String)
      : Map[Int, String] =
    schemaFieldPaths(readMetadata(spark, table)).view.mapValues(_.last).toMap

  /** Iceberg type string/node → Spark type, for the field-id read
    * schema. Lists/maps/uuid gate loudly — the field-id path is about
    * rename-safe column resolution, and those shapes haven't earned a
    * silent representation choice. */
  private def icebergTypeToSpark(t: com.fasterxml.jackson.databind.JsonNode)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    if (t.isTextual) t.asText() match {
      case "long" => LongType
      case "int" | "integer" => IntegerType
      case "string" => StringType
      case "double" => DoubleType
      case "float" => FloatType
      case "boolean" => BooleanType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "binary" => BinaryType
      case s if s.startsWith("decimal(") && s.endsWith(")") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")")
          .split(",").map(_.trim.toInt)
        DecimalType(p, sc)
      case other => throw new IllegalArgumentException(
        s"iceberg type '$other' is not supported by the field-id read path")
    } else Option(t.get("type")).map(_.asText()) match {
      case Some("struct") => icebergStructToSpark(t)
      case other => throw new IllegalArgumentException(
        s"iceberg type '${other.getOrElse(t)}' is not supported by the " +
          "field-id read path")
    }
  }

  private def icebergStructToSpark(node: com.fasterxml.jackson.databind.JsonNode)
      : org.apache.spark.sql.types.StructType = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    StructType(Option(node.get("fields")).toSeq
      .flatMap(_.elements().asScala).map { f =>
        val id = Option(f.get("id")).map(_.asInt()).getOrElse(
          throw new IllegalArgumentException(
            s"schema field ${f.get("name")} has no id"))
        StructField(f.get("name").asText(), icebergTypeToSpark(f.get("type")),
          nullable = !Option(f.get("required")).exists(_.asBoolean()),
          metadata = new MetadataBuilder()
            .putLong("parquet.field.id", id.toLong).build())
      })
  }

  /** The current schema as a Spark read schema with `parquet.field.id`
    * metadata on every field — the rename-safe projection real Iceberg
    * clients use. None when the metadata carries no schema. */
  private[graft] def fieldIdReadSchema(
      meta: com.fasterxml.jackson.databind.JsonNode)
      : Option[org.apache.spark.sql.types.StructType] =
    currentSchemaNode(meta).map(icebergStructToSpark)

  /** Does this parquet file's footer carry field ids? One driver-side
    * footer read — the detection gate for id-based resolution (real
    * Iceberg writers always stamp ids; plain Spark fixtures may not). */
  private[graft] def parquetHasFieldIds(spark: SparkSession,
                                        file: String): Boolean = {
    val p = new Path(file)
    val conf = spark.sparkContext.hadoopConfiguration
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, p, org.apache.parquet.format.converter.ParquetMetadataConverter.SKIP_ROW_GROUPS)
    import scala.jdk.CollectionConverters._
    footer.getFileMetaData.getSchema.getFields.asScala.exists(_.getId != null)
  }

  /** PARTITION-PRUNED scan: when every data file carries the same
    * identity-transform partition tuple in its manifest entry and the
    * tuple's field names resolve to top-level schema columns, the scan
    * is built over a [[StaticFileIndex]] whose partition columns come
    * from the MANIFEST tuples — partition predicates then prune FILES
    * at planning time (the scan never opens a non-matching file),
    * exactly Iceberg's scan-planning contract. Data files may or may
    * not repeat the identity source columns (real Iceberg writers do):
    * the data schema excludes them either way and the values come from
    * the index. Returns None — and the caller falls back to the plain
    * scan — for unpartitioned tables, transform partitions
    * (bucket/truncate/days names don't resolve in the schema), or
    * metadata without a schema: pruning is an optimization, never a
    * correctness gate. File lengths come from the manifests'
    * `file_size_in_bytes` (one driver `getFileStatus` per file written
    * by older fixtures without true sizes). */
  private def partitionedScan(spark: SparkSession, table: String,
                              files: Seq[Tracked],
                              meta: com.fasterxml.jackson.databind.JsonNode)
      : Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val sigs = files.map(_.partition.map(_._1)).distinct
    if (sigs.isEmpty || sigs == Seq(Seq.empty)) return None // unpartitioned
    val schema = fieldIdReadSchema(meta).getOrElse(return None)
    if (sigs.size > 1) // MIXED tuple shapes: partition EVOLUTION left
      // files under older specs — prune each group through its own spec
      return transformScan(spark, table, files, meta, schema)
    val names = sigs.head
    val resolved = names.map(n => schema.fields.find(_.name == n))
    if (resolved.exists(_.isEmpty)) // not identity columns: try the
      return transformScan(spark, table, files, meta, schema)
    val pFields = resolved.flatten
    val partitionSchema = StructType(pFields.map(f =>
      StructField(f.name, f.dataType, f.nullable)))
    // id-less files must NOT see an id-carrying read schema: with the
    // session flag on (sticky once any id-based read ran), the reader
    // demands footer ids and fails
    val useIds = parquetHasFieldIds(spark, files.head.path)
    if (useIds) spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dataSchema = StructType(
      schema.fields.filterNot(f => names.contains(f.name)).toSeq
        .map(f => if (useIds) f else f.copy(metadata = Metadata.empty)))
    val conf = spark.sparkContext.hadoopConfiguration
    def status(t: Tracked): org.apache.hadoop.fs.FileStatus = {
      val p = new Path(t.path)
      val len = if (t.size > 1L) t.size
                else p.getFileSystem(conf).getFileStatus(p).getLen
      new org.apache.hadoop.fs.FileStatus(len, false, 1, 128L << 20, 0L, p)
    }
    def internalValue(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (l: Long, LongType) => l
      case (l: Long, IntegerType) => l.toInt
      case (i: Int, IntegerType) => i
      case (i: Int, LongType) => i.toLong
      case (i: Int, DateType) => i // iceberg dates are epoch days
      case (s: String, _) => StaticFileIndex.partitionValue(s, dt)
      case (other, t) => throw new IllegalArgumentException(
        s"unsupported partition value $other for type $t")
    }
    val partitions = files.groupBy(_.partition).toSeq
      .sortBy(_._1.map(p => String.valueOf(p._2)).mkString("/"))
      .map { case (pv, group) =>
        val row: org.apache.spark.sql.catalyst.InternalRow =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            pv.zip(partitionSchema.fields).map { case ((_, v), f) =>
              internalValue(v, f.dataType)
            }.toArray[Any])
        (row, group.map(status).toArray)
      }
    import org.apache.spark.sql.functions.col
    Some(StaticFileIndex.parquetRelation(spark, new Path(table),
        dataSchema, partitionSchema, partitions)
      .select(schema.fieldNames.toSeq.map(col): _*)) // declared order
  }

  /** ALL partition specs' fields merged: tuple field name →
    * (transform, source column name), resolved through the schema's
    * field ids. Specs fold in ascending spec-id order with the DEFAULT
    * spec overlaid last, so under partition evolution a re-used field
    * name resolves to the current spec's meaning while older specs'
    * names stay resolvable for the files still carrying their tuples.
    * Empty when the metadata records no `partition-specs` or a source
    * id doesn't resolve to a TOP-LEVEL column. */
  private def partitionSpecFields(meta: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, (String, String)] = {
    import scala.jdk.CollectionConverters._
    val idToPath = schemaFieldPaths(meta)
    val specs = Option(meta.get("partition-specs")).toSeq
      .flatMap(_.elements().asScala).toSeq
    val wanted = Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
    def fieldsOf(s: com.fasterxml.jackson.databind.JsonNode)
        : Seq[(String, (String, String))] =
      Option(s.get("fields")).toSeq.flatMap(_.elements().asScala).flatMap { f =>
        for {
          name <- Option(f.get("name")).map(_.asText())
          transform <- Option(f.get("transform")).map(_.asText())
          sourceId <- Option(f.get("source-id")).map(_.asInt())
          path <- idToPath.get(sourceId) if path.length == 1
        } yield name -> (transform, path.head)
      }.toSeq
    val ordered = specs.sortBy(s =>
      Option(s.get("spec-id")).map(_.asInt()).getOrElse(0))
    val default = ordered.filter(s =>
      Option(s.get("spec-id")).exists(_.asInt() == wanted))
    (ordered.filterNot(default.contains) ++ default)
      .flatMap(fieldsOf).toMap
  }

  /** HIDDEN-PARTITIONED scan: tuple field names that do NOT resolve to
    * schema columns are looked up in the table's `partition-specs`;
    * when every field has a supported transform over a resolvable
    * source column, the scan is built over a [[TransformFileIndex]] —
    * data-column predicates (`ts >= X`, `id = k`) then prune FILES
    * through the transforms at planning time, Iceberg's
    * hidden-partitioning contract. Every output column reads from the
    * data files (the tuple is metadata only).
    *
    * Handles partition EVOLUTION: files are grouped by their tuple
    * SHAPE and each group resolves against the table's merged
    * `partition-specs`, so files written under an older spec (or before
    * any partitioning — empty tuples, never pruned) coexist with the
    * current spec's files in ONE scan, each pruned through its own
    * transforms. Identity fields are gated on the source column being
    * present in the group's data files (one footer probe per group):
    * manifest-only identity values cannot be served per-group by a
    * transform index, and silently null-filling them would corrupt
    * results. Returns None — full-scan fallback — when a transform is
    * unknown or a source is nested. */
  private def transformScan(spark: SparkSession, table: String,
                            files: Seq[Tracked],
                            meta: com.fasterxml.jackson.databind.JsonNode,
                            schema: org.apache.spark.sql.types.StructType)
      : Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val specFields = partitionSpecFields(meta)
    if (specFields.isEmpty) return None
    val bySig: Seq[(Seq[String], Seq[Tracked])] =
      files.groupBy(_.partition.map(_._1)).toSeq
        .sortBy(_._1.mkString("/"))
    val sigSpecs: Map[Seq[String], Seq[IcebergTransforms.SpecField]] =
      bySig.map { case (sig, _) =>
        sig -> sig.map { n =>
          (for {
            (transform, srcName) <- specFields.get(n)
            f <- schema.fields.find(_.name == srcName)
            if IcebergTransforms.supported(transform, f.dataType)
          } yield IcebergTransforms.SpecField(n, transform, f.name, f.dataType))
            .getOrElse(return None)
        }
      }.toMap
    // identity sources must live in the data files (real Iceberg writers
    // always repeat them; Hive-migrated files may not) — one footer
    // probe per signature group, loud gate instead of silent nulls
    bySig.foreach { case (sig, group) =>
      val identitySrcs = sigSpecs(sig).filter(_.transform == "identity")
      if (identitySrcs.nonEmpty) {
        val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
          spark.sparkContext.hadoopConfiguration, new Path(group.head.path),
          org.apache.parquet.format.converter.ParquetMetadataConverter.SKIP_ROW_GROUPS)
        import scala.jdk.CollectionConverters._
        val present = footer.getFileMetaData.getSchema.getFields.asScala
          .map(_.getName).toSet
        identitySrcs.foreach(s => require(present.contains(s.sourceName),
          s"identity partition source '${s.sourceName}' is absent from the " +
            s"data files of tuple shape ${sig.mkString("(", ",", ")")} — " +
            "manifest-only identity columns cannot be served under " +
            "partition evolution; rewrite the files to carry the column"))
      }
    }
    val useIds = parquetHasFieldIds(spark, files.head.path)
    if (useIds) spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dataSchema = StructType(schema.fields.toSeq
      .map(f => if (useIds) f else f.copy(metadata = Metadata.empty)))
    val conf = spark.sparkContext.hadoopConfiguration
    def status(t: Tracked): org.apache.hadoop.fs.FileStatus = {
      val p = new Path(t.path)
      val len = if (t.size > 1L) t.size
                else p.getFileSystem(conf).getFileStatus(p).getLen
      new org.apache.hadoop.fs.FileStatus(len, false, 1, 128L << 20, 0L, p)
    }
    def tupleValue(v: Any): Any = v match {
      case null => null
      case l: Long => l
      case i: Int => i
      case c: CharSequence => c.toString
      case other => other.toString
    }
    val groups = bySig.flatMap { case (sig, sigFiles) =>
      sigFiles.groupBy(_.partition).toSeq
        .sortBy(_._1.map(p => String.valueOf(p._2)).mkString("/"))
        .map { case (pv, group) =>
          (sigSpecs(sig), pv.map(p => tupleValue(p._2)),
            group.map(status).toArray)
        }
    }
    val index = new TransformFileIndex(new Path(table), groups)
    import org.apache.spark.sql.functions.col
    Some(StaticFileIndex.transformParquetRelation(spark, new Path(table),
        dataSchema, index)
      .select(schema.fieldNames.toSeq.map(col): _*))
  }

  /** The data-side scan: resolve columns BY FIELD ID when the metadata
    * has a schema and the files carry ids (rename-safe — a column
    * renamed in the table schema reads old files correctly); otherwise
    * fall back to name-based schema inference (plain-Spark fixture
    * files). The session flag only affects reads whose schema carries
    * id metadata, so setting it is safe table-wide. */
  private def dataScan(spark: SparkSession, files: Seq[String],
                       meta: com.fasterxml.jackson.databind.JsonNode): DataFrame =
    fieldIdReadSchema(meta) match {
      case Some(schema) if files.nonEmpty &&
          parquetHasFieldIds(spark, files.head) =>
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        spark.read.schema(schema).parquet(files: _*)
      case _ => spark.read.parquet(files: _*)
    }

  /** Snapshot ids pinned by refs (tags/branches) — expiry must retain
    * them. */
  private[graft] def refSnapshotIds(
      meta: com.fasterxml.jackson.databind.JsonNode): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Option(meta.get("refs")).toSeq.flatMap(_.fields().asScala.map { e =>
      e.getKey -> e.getValue.get("snapshot-id").asLong()
    }).toMap
  }

  /** Read the snapshot a REF (tag or branch) points at —
    * `FOR VERSION AS OF 'v1.0'` semantics over the metadata's `refs`. */
  def snapshotAtRef(spark: SparkSession, table: String, ref: String,
                    maxFiles: Int = 1000000): DataFrame = {
    val ids = refSnapshotIds(readMetadata(spark, table))
    val id = ids.getOrElse(ref, throw new IllegalArgumentException(
      s"$table has no ref '$ref' (refs: ${ids.keys.toSeq.sorted.mkString(", ")})"))
    snapshot(spark, table, Some(id), maxFiles)
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
    val (files, posDeletes, eqGroups) = snapshotFiles(spark, manifestList, maxFiles)
    if (files.isEmpty) spark.emptyDataFrame
    else if (posDeletes.isEmpty && eqGroups.isEmpty)
      partitionedScan(spark, table, files, meta).getOrElse(
        dataScan(spark, files.map(_.path), meta))
    else applyDeletes(spark, files, posDeletes, eqGroups,
      schemaFieldPaths(meta), meta)
  }

  /** The CURRENT snapshot's live data files (manifest spelling +
    * sequence numbers) — the write side's planning input for
    * [[graft.sink.IcebergWrite.deleteWhere]]. */
  private[graft] def currentDataFiles(spark: SparkSession, table: String,
                                      maxFiles: Int = 1000000): Seq[Tracked] = {
    val meta = readMetadata(spark, table)
    val cur = Option(meta.get("current-snapshot-id")).map(_.asLong()).getOrElse(
      throw new IllegalArgumentException("metadata has no current-snapshot-id"))
    import scala.jdk.CollectionConverters._
    val snap = Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala)
      .find(_.get("snapshot-id").asLong() == cur)
      .getOrElse(throw new IllegalArgumentException(
        s"current snapshot $cur not present in metadata"))
    snapshotFiles(spark, snap.get("manifest-list").asText(), maxFiles)._1
  }

  /** Broadcast map from `_metadata.file_path`'s spelling back to the
    * manifest path spelling (+ the file's sequence number). Keys use
    * [[DeletionVectors.sparkPathString]] of the QUALIFIED path — Spark
    * renders `_metadata.file_path` in SparkPath form (percent-encoded,
    * no empty-authority slashes), so `Path.toString` (raw spaces) and
    * `Path.toUri` (`file:///`) both silently mismatch. Guarded at the
    * join sites: a row from a file missing in the map raises rather than
    * silently keeping rows whose deletes we failed to bridge. */
  private def qualifiedMap(spark: SparkSession, files: Seq[Tracked]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rows = files.map { t =>
      val hp = new Path(t.path)
      (DeletionVectors.sparkPathString(hp.getFileSystem(conf).makeQualified(hp)),
        t.path, t.seq)
    }
    spark.createDataFrame(rows).toDF("__qualified", "__manifest_path", "__seq")
  }

  /** Merge v2 delete files into the data scan:
    *  - position deletes: ANTI JOIN on `(file_path, pos)` against Spark's
    *    `_metadata` columns (which exist for exactly this bookkeeping).
    *  - equality deletes: per `equality_ids` group, ANTI JOIN on null-safe
    *    equality over the resolved columns plus the spec's strict
    *    sequence-number scoping (`delete.seq > data.seq`).
    * The data side stays one pushdown-capable parquet scan; each delete
    * class is its own scan feeding a join build side. */
  /** Expand format-v3 deletion-vector entries to `(__manifest_path,
    * __pos)` rows, executor-side: one flatMap task cluster over the blob
    * descriptors, each reading + CRC-checking its puffin blob
    * ([[Puffin.readDv]]). Driver state is the descriptor list (bounded
    * by delete-FILE count). */
  private def dvPositions(spark: SparkSession, dvs: Seq[Tracked]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val props = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray)
    val descs = dvs.map(t => (t.path, t.dv.get._1, t.dv.get._2, t.dv.get._3))
    spark.sparkContext
      .parallelize(descs,
        math.max(1, math.min(descs.size,
          spark.sparkContext.defaultParallelism * 2)))
      .flatMap { case (puffin, ref, off, len) =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        props.value.foreach { case (k, v) => c.set(k, v) }
        Puffin.readDv(c, puffin, off, len).iterator.map(p => (ref, p))
      }
      .toDF("__manifest_path", "__pos")
  }

  private def applyDeletes(spark: SparkSession, files: Seq[Tracked],
                           posDeletes: Seq[Tracked], eqGroups: Seq[EqGroup],
                           fieldPaths: Map[Int, Seq[String]],
                           meta: com.fasterxml.jackson.databind.JsonNode): DataFrame = {
    import org.apache.spark.sql.functions._
    // _metadata.file_path carries the Hadoop Path rendering of the
    // qualified path (file:/x, not the URI form file:///x)
    val data = dataScan(spark, files.map(_.path), meta)
    // manifest-tuple partition columns ABSENT from the data files (the
    // partitioned-scan layout) must survive the delete merge: without
    // this the no-deletes path serves them from the manifests while the
    // first upsert/delete silently turns them null/absent. The values
    // ride the same broadcast file map the seq numbers use; types come
    // from the table schema when it declares the field (string
    // otherwise, mirroring partitionedScan's fallback).
    val partNames = files.headOption.map(_.partition.map(_._1)).getOrElse(Nil)
    val attachNames =
      if (partNames.nonEmpty &&
          files.forall(_.partition.map(_._1) == partNames))
        partNames.filterNot(data.columns.contains)
      else Nil
    val cols = {
      val base = data.columns.toSeq ++ attachNames
      val declared = fieldIdReadSchema(meta).map(_.fieldNames.toSeq)
        .getOrElse(Nil)
      // declared order when the attach restores exactly the schema shape
      // (parity with partitionedScan's no-deletes output)
      if (declared.nonEmpty && base.toSet == declared.toSet) declared else base
    }
    var keyed = data
      .withColumn("__qualified", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(broadcast(qualifiedMap(spark, files)), Seq("__qualified"), "left")
      .withColumn("__manifest_path",
        when(col("__manifest_path").isNull, raise_error(concat(
          lit("Iceberg delete merge: data file not in path map: "),
          col("__qualified")))).otherwise(col("__manifest_path")))
    if (attachNames.nonEmpty) {
      val schemaTypes: Map[String, org.apache.spark.sql.types.DataType] =
        fieldIdReadSchema(meta).map(_.fields.map(f => f.name -> f.dataType)
          .toMap).getOrElse(Map.empty)
      val conf = spark.sparkContext.hadoopConfiguration
      val pvRows = files.map { t =>
        val hp = new Path(t.path)
        org.apache.spark.sql.Row.fromSeq(
          DeletionVectors.sparkPathString(
            hp.getFileSystem(conf).makeQualified(hp)) +:
          t.partition.filter(p => attachNames.contains(p._1)).map {
            case (_, v) => if (v == null) null else String.valueOf(v)
          })
      }
      val pvSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__qualified",
          org.apache.spark.sql.types.StringType) +:
        attachNames.map(n => org.apache.spark.sql.types.StructField(
          s"__pv_$n", org.apache.spark.sql.types.StringType)))
      val pvMap = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(pvRows).asJava), pvSchema)
      keyed = keyed.join(broadcast(pvMap), Seq("__qualified"), "left")
      attachNames.foreach { n =>
        val pv = col(s"__pv_$n")
        val typed = schemaTypes.get(n) match {
          case Some(org.apache.spark.sql.types.DateType) =>
            // manifests store date partitions as epoch DAYS (int); a
            // string-typed fixture value parses as a date literal
            when(pv.rlike("^-?\\d+$"),
              date_add(to_date(lit("1970-01-01")), pv.cast("int")))
              .otherwise(pv.cast("date"))
          case Some(t) => pv.cast(t)
          case None => pv
        }
        keyed = keyed.withColumn(n, typed)
      }
    }
    // content=1 splits into v2 position-delete parquet and v3 DELETION
    // VECTORS (puffin blobs); both resolve to (file, pos) rows and share
    // one anti-join. DV blobs expand on EXECUTORS (one task per blob
    // cluster) — positions never visit the driver.
    val (dvEntries, parquetPos) = posDeletes.partition(_.dv.isDefined)
    val posFrames = Seq(
      if (parquetPos.nonEmpty)
        Some(spark.read.parquet(parquetPos.map(_.path): _*)
          .select(col("file_path").as("__manifest_path"),
            col("pos").as("__pos")))
      else None,
      if (dvEntries.nonEmpty) Some(dvPositions(spark, dvEntries)) else None
    ).flatten
    posFrames.reduceOption(_ unionByName _).foreach { deletes =>
      keyed = keyed.join(deletes, Seq("__manifest_path", "__pos"), "left_anti")
    }
    // a nested path like meta.zip resolves by getField steps (dot-string
    // column refs would mis-parse names containing dots)
    def hasPath(schema: org.apache.spark.sql.types.StructType,
                path: Seq[String]): Boolean = path match {
      case head +: rest =>
        schema.fields.find(_.name == head).exists { f =>
          rest.isEmpty || (f.dataType match {
            case s: org.apache.spark.sql.types.StructType => hasPath(s, rest)
            case _ => false
          })
        }
      case _ => false
    }
    def pathCol(df: DataFrame, path: Seq[String]) =
      path.tail.foldLeft(df(path.head))(_.getField(_))
    eqGroups.foreach { g =>
      val paths = g.fieldIds.map { id =>
        fieldPaths.getOrElse(id, throw new IllegalArgumentException(
          s"equality-delete field id $id not in the table schema " +
            s"(known ids: ${fieldPaths.keys.toSeq.sorted.mkString(",")})"))
      }
      paths.foreach(p => require(hasPath(data.schema, p),
        s"equality-delete column ${p.mkString(".")} absent from the data schema"))
      def alias(p: Seq[String]) = "__del_" + p.mkString("_")
      val delData = spark.read.parquet(g.files.map(_.path): _*)
      paths.foreach(p => require(hasPath(delData.schema, p),
        s"equality-delete column ${p.mkString(".")} absent from the delete files"))
      val deletes = delData
        .withColumn("__dq", col("_metadata.file_path"))
        .join(broadcast(qualifiedMap(spark, g.files)
          .select(col("__qualified").as("__dq"), col("__seq").as("__dseq"))),
          Seq("__dq"), "left")
        // an unmapped delete file would leave __dseq null, the seq
        // comparison would yield null, and the delete rows would be
        // silently DROPPED — same raise_error seatbelt as the data side
        .withColumn("__dseq",
          when(col("__dseq").isNull, raise_error(concat(
            lit("Iceberg delete merge: delete file not in path map: "),
            col("__dq"))).cast("long")).otherwise(col("__dseq")))
      val projected = deletes.select(
        deletes("__dseq") +: paths.map(p => pathCol(deletes, p).as(alias(p))): _*)
      val cond = paths.map(p => pathCol(keyed, p) <=> projected(alias(p)))
        .reduce(_ && _) && projected("__dseq") > keyed("__seq")
      keyed = keyed.join(projected, cond, "left_anti")
    }
    keyed.select(cols.map(col): _*)
  }
}
