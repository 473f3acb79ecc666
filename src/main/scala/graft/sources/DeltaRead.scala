package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Snapshot / time-travel reader for Delta Lake tables (the published
  * `_delta_log` protocol: one JSON action file per version named
  * `%020d.json` with `add` / `remove` / `metaData` / `protocol` actions,
  * plus parquet checkpoints advertised in `_last_checkpoint`) — with
  * [[HudiRead]] this closes the lakehouse-interop loop: tables written by
  * the two dominant open table formats are directly readable.
  *
  * Semantics:
  *  - snapshot at version V = state of the newest checkpoint ≤ V replayed
  *    forward through the JSON versions (cp, V]; without a checkpoint,
  *    replay 0..V. The live file set is adds minus later removes, keyed
  *    by path. A long-lived production table vacuums its early JSON
  *    versions, so checkpoint replay is what makes such tables readable
  *    at all.
  *  - `add.path` is percent-encoded per the protocol → URI-decoded before
  *    resolving against the table root.
  *  - partition columns (`metaData.partitionColumns`) are reconstructed
  *    from each add's `partitionValues` and TYPED per
  *    `metaData.schemaString` — they are absent from the data files by
  *    protocol. The whole snapshot is ONE parquet scan over a
  *    [[StaticFileIndex]], so the plan is O(1) in partition-tuple count
  *    and partition-column predicates prune FILES at planning time, not
  *    rows at runtime.
  *  - `versionAsOf` time travel replays a prefix of the log.
  *
  * Protocol gate: reader version ≤ 1 features only (no deletion vectors,
  * no column mapping) — a table using newer reader features fails loudly
  * with the feature name rather than silently mis-reading.
  *
  * Scale notes: the driver touches only the log actions (the same
  * metadata any Delta client loads — file sizes/mtimes included, so the
  * index makes zero per-file filesystem calls); data bytes flow through
  * one pushdown-capable parquet scan. */
object DeltaRead {

  private def mapper = DocPushdown.jsonMapper

  final case class AddFile(path: String, partitionValues: Map[String, String],
                           size: Long, modificationTime: Long)

  /** Replay state: live files keyed by (still-encoded) path. */
  private final class State {
    val live = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    var partitionCols: Seq[String] = Seq.empty
    var schemaString: Option[String] = None

    def gate(minReader: Int): Unit = require(minReader <= 1,
      s"Delta table requires reader version $minReader " +
        "(deletion vectors / column mapping not supported by this reader)")
  }

  /** `_delta_log` contents, listed once. */
  private final case class LogListing(jsonVersions: Set[Long],
                                      checkpoints: Map[Long, Seq[Path]])

  private def listLog(fs: org.apache.hadoop.fs.FileSystem, dir: Path): LogListing = {
    val names = fs.listStatus(dir).map(_.getPath.getName)
    val json = names.collect {
      case n if n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit) =>
        n.stripSuffix(".json").toLong
    }.toSet
    // single-part: %020d.checkpoint.parquet
    // multi-part:  %020d.checkpoint.%010d.%010d.parquet
    val cpParts = names.flatMap { n =>
      val segs = n.split('.')
      if (segs.length == 3 && segs(1) == "checkpoint" && segs(2) == "parquet" &&
          segs(0).forall(_.isDigit))
        Some((segs(0).toLong, n))
      else if (segs.length == 5 && segs(1) == "checkpoint" && segs(4) == "parquet" &&
               segs(0).forall(_.isDigit) && segs(2).forall(_.isDigit) &&
               segs(3).forall(_.isDigit))
        Some((segs(0).toLong, n))
      else None
    }
    val checkpoints = cpParts.groupBy(_._1).map { case (v, parts) =>
      v -> parts.map(p => new Path(dir, p._2)).toSeq.sortBy(_.getName)
    }
    LogListing(json, checkpoints)
  }

  /** Latest version number present in the log (JSON or checkpoint). */
  def latestVersion(spark: SparkSession, table: String): Long = {
    val dir = new Path(table, "_delta_log")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) throw new IllegalArgumentException(
      s"$table is not a Delta table (no _delta_log directory)")
    val listing = listLog(fs, dir)
    val versions = listing.jsonVersions ++ listing.checkpoints.keySet
    require(versions.nonEmpty, s"$table has no Delta log versions")
    versions.max
  }

  /** Load checkpoint rows into the state: the checkpoint IS the replayed
    * state at its version (adds are the live set; remove rows are vacuum
    * tombstones, irrelevant to a snapshot). */
  private def loadCheckpoint(spark: SparkSession, state: State,
                             parts: Seq[Path]): Unit = {
    val cp = spark.read.parquet(parts.map(_.toString): _*)
    val cols = cp.schema.fieldNames.map(_.toLowerCase).toSet
    if (cols.contains("protocol"))
      cp.selectExpr("protocol.minReaderVersion")
        .where("protocol IS NOT NULL").collect()
        .foreach(r => if (!r.isNullAt(0)) state.gate(r.getInt(0)))
    if (cols.contains("metadata"))
      cp.selectExpr("metaData.partitionColumns", "metaData.schemaString")
        .where("metaData IS NOT NULL").collect().foreach { r =>
          if (!r.isNullAt(0))
            state.partitionCols = r.getSeq[String](0)
          if (!r.isNullAt(1)) state.schemaString = Some(r.getString(1))
        }
    cp.selectExpr("add.path", "add.partitionValues", "add.size",
        "add.modificationTime")
      .where("add IS NOT NULL").collect().foreach { r =>
        state.live(r.getString(0)) = AddFile(r.getString(0),
          Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
          if (r.isNullAt(2)) 0L else r.getLong(2),
          if (r.isNullAt(3)) 0L else r.getLong(3))
      }
  }

  private def applyJsonVersion(fs: org.apache.hadoop.fs.FileSystem,
                               state: State, f: Path): Unit = {
    val in = fs.open(f)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    lines.foreach { line =>
      val node = mapper.readTree(line)
      Option(node.get("protocol")).foreach { p =>
        state.gate(Option(p.get("minReaderVersion")).map(_.asInt).getOrElse(1))
      }
      Option(node.get("metaData")).foreach { m =>
        import scala.jdk.CollectionConverters._
        state.partitionCols = Option(m.get("partitionColumns")).toSeq
          .flatMap(_.elements().asScala.map(_.asText()))
        state.schemaString =
          Option(m.get("schemaString")).map(_.asText()).orElse(state.schemaString)
      }
      Option(node.get("add")).foreach { a =>
        import scala.jdk.CollectionConverters._
        val path = a.get("path").asText()
        val pv = Option(a.get("partitionValues")).map(_.fields().asScala.map { e =>
          e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
        }.toMap).getOrElse(Map.empty)
        state.live(path) = AddFile(path, pv,
          Option(a.get("size")).map(_.asLong).getOrElse(0L),
          Option(a.get("modificationTime")).map(_.asLong).getOrElse(0L))
      }
      Option(node.get("remove")).foreach { r =>
        state.live.remove(r.get("path").asText())
      }
    }
  }

  /** Replay the log to `version`: newest checkpoint ≤ version, then the
    * JSON suffix. */
  private def replay(spark: SparkSession, table: String, version: Long): State = {
    val dir = new Path(table, "_delta_log")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listing = listLog(fs, dir)
    val state = new State
    // _last_checkpoint is a hint for the common latest-snapshot case; the
    // listing is authoritative (and covers time travel BEFORE the hint)
    val cpVersion = listing.checkpoints.keys.filter(_ <= version)
      .reduceOption(_ max _)
    cpVersion.foreach(v => loadCheckpoint(spark, state, listing.checkpoints(v)))
    var v = cpVersion.map(_ + 1).getOrElse(0L)
    while (v <= version) {
      if (!listing.jsonVersions.contains(v)) throw new IllegalArgumentException(
        s"Delta log version $v missing from $table " +
          (if (cpVersion.isEmpty && listing.checkpoints.nonEmpty)
             s"(vacuumed; the oldest readable version is checkpoint " +
               s"${listing.checkpoints.keys.min})"
           else "(vacuumed past the newest checkpoint?)"))
      applyJsonVersion(fs, state, new Path(dir, f"$v%020d.json"))
      v += 1
    }
    state
  }

  /** Replayed table state at `version`: (live files, partition columns,
    * schemaString) — the planning data a writer (checkpointing, partition
    * replacement) or catalog needs. */
  def tableState(spark: SparkSession, table: String, version: Long)
      : (Seq[AddFile], Seq[String], Option[String]) = {
    val state = replay(spark, table, version)
    (state.live.values.toSeq, state.partitionCols, state.schemaString)
  }

  /** `add.path` is a relative or absolute URI, percent-encoded (RFC 2396)
    * per the protocol. Non-conforming writers occasionally emit raw
    * (unencoded) paths — tolerated by falling back to the literal
    * spelling when the string does not parse as a URI. */
  private def resolvePath(table: String, raw: String): Path = {
    val uri = try new URI(raw) catch {
      case _: java.net.URISyntaxException =>
        new java.net.URI(null, null, raw, null) // treat as a literal path
    }
    if (uri.isAbsolute || raw.startsWith("/")) new Path(uri)
    else new Path(new Path(table), new Path(uri))
  }

  /** Snapshot at the latest (or `versionAsOf`) version. */
  def snapshot(spark: SparkSession, table: String,
               versionAsOf: Option[Long] = None): DataFrame = {
    val version = versionAsOf.getOrElse(latestVersion(spark, table))
    val state = replay(spark, table, version)
    val files = state.live.values.toSeq
    if (files.isEmpty) return spark.emptyDataFrame
    val partitionCols = state.partitionCols

    val declared: Option[StructType] =
      state.schemaString.map(DataType.fromJson(_).asInstanceOf[StructType])
    // partition columns are typed by the declared schema; a log without a
    // schemaString (non-standard) degrades to strings + inference
    val partitionSchema = StructType(partitionCols.map { c =>
      declared.flatMap(s => s.fields.find(_.name.equalsIgnoreCase(c)))
        .getOrElse(StructField(c, StringType))
    })
    def statuses(group: Seq[AddFile]): Array[FileStatus] = group.map { f =>
      new FileStatus(f.size, false, 1, 128L << 20, f.modificationTime,
        resolvePath(table, f.path))
    }.toArray
    val partitions: Seq[(InternalRow, Array[FileStatus])] =
      if (partitionCols.isEmpty) Seq((InternalRow.empty, statuses(files)))
      else files.groupBy(f => partitionCols.map(f.partitionValues.getOrElse(_, null)))
        .toSeq.map { case (values, group) =>
          val row = new GenericInternalRow(values.zipWithIndex.map {
            case (raw, i) =>
              StaticFileIndex.partitionValue(raw, partitionSchema(i).dataType)
          }.toArray[Any])
          (row: InternalRow, statuses(group))
        }
    val dataSchema = declared match {
      case Some(s) =>
        StructType(s.fields.filterNot(f =>
          partitionCols.exists(_.equalsIgnoreCase(f.name))))
      case None =>
        // schema inference over the live files (degraded, non-standard logs)
        spark.read.parquet(files.map(f => resolvePath(table, f.path).toString): _*)
          .schema
    }
    val df = StaticFileIndex.parquetRelation(spark, new Path(table),
      dataSchema, partitionSchema, partitions)
    // present columns in the table's declared order (partition columns sit
    // at their metadata positions, matching what Delta clients return)
    declared match {
      case Some(s) => df.select(s.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      case None => df
    }
  }
}
