package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{DeltaRead, DocPushdown}

/** Minimal Delta Lake WRITER — the inverse of [[graft.sources.DeltaRead]]
  * and the interop completion of the lake layer: tables this writes are
  * readable by any Delta client (the published `_delta_log` protocol:
  * JSON action versions with `protocol` / `metaData` / `add` / `remove`,
  * plus parquet checkpoints advertised in `_last_checkpoint`), without
  * the Delta runtime on the classpath.
  *
  * Shape: data files land through Spark's own partitioned parquet writer
  * (hive-layout directories, partition columns dropped from the files —
  * exactly Delta's physical layout), then the log actions record the
  * resulting file set with TRUE sizes/mtimes from the filesystem, the
  * declared `schemaString`, and `partitionValues` parsed back from the
  * directory names. Writer concurrency control (optimistic commit
  * protocol) is out of scope — single-writer semantics, like every other
  * fixture-grade writer here; readers see only completed versions.
  */
object DeltaWrite {

  // checkpoint row shapes (field names per the Delta checkpoint schema);
  // not `private` — Catalyst codegen cannot call accessors on private
  // nested classes and would fall back to the interpreter
  case class CpProto(minReaderVersion: Int, minWriterVersion: Int,
                             readerFeatures: Option[Seq[String]],
                             writerFeatures: Option[Seq[String]])
  case class CpMeta(id: String, partitionColumns: Seq[String],
                            schemaString: Option[String],
                            configuration: Option[Map[String, String]])
  case class CpDv(storageType: String, pathOrInlineDv: String,
                          offset: Option[Int], sizeInBytes: Int, cardinality: Long)
  case class CpAdd(path: String, partitionValues: Map[String, String],
                           size: Long, modificationTime: Long,
                           deletionVector: Option[CpDv])
  case class CpTxn(appId: String, version: Long)
  case class CpRow(protocol: Option[CpProto], metaData: Option[CpMeta],
                           add: Option[CpAdd],
                           txn: Option[CpTxn] = None)

  private def mapper = DocPushdown.jsonMapper

  private def logDir(table: String) = new Path(table, "_delta_log")

  private def nextVersion(spark: SparkSession, table: String): Long = {
    val dir = logDir(table)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
      case n if n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit) =>
        n.stripSuffix(".json").toLong + 1L
      // a log-vacuumed table may hold ONLY its checkpoint at the tip —
      // the checkpoint version counts, or post-vacuum appends would
      // restart the log at version 0
      case n if n.contains(".checkpoint") &&
          n.substring(0, n.indexOf(".checkpoint")).forall(_.isDigit) &&
          n.indexOf(".checkpoint") > 0 =>
        n.substring(0, n.indexOf(".checkpoint")).toLong + 1L
    }.maxOption.getOrElse(0L)
  }

  private[graft] def writeVersion(spark: SparkSession, table: String, version: Long,
                                  lines: Seq[String],
                                  /** Recorded as the commit's `commitInfo
                                    * .operation` (the protocol's optional
                                    * informational action — what DESCRIBE
                                    * HISTORY displays). Null skips it. */
                                  operation: String = null): Unit = {
    val dir = logDir(table)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val info = Option(operation).map(op =>
      s"""{"commitInfo":{"operation":${jstr(op)}}}""").toSeq
    val out = fs.create(new Path(dir, f"$version%020d.json"), false)
    try out.write(((info ++ lines).mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def jstr(s: String): String = mapper.writeValueAsString(s)

  /** List the parquet files Spark just wrote under `dataRoot`, with
    * partition values parsed from the hive-layout directory names. */
  private def writtenFiles(spark: SparkSession, table: String,
                           subtree: String): Seq[(String, Map[String, String], Long, Long)] = {
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, String], Long, Long)]
    def walk(p: Path, rel: String, pv: Map[String, String]): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          if (name != "_delta_log") {
            val pv2 = name.split('=') match {
              case Array(k, v) => pv + (k -> v)
              case _ => pv
            }
            walk(st.getPath, if (rel.isEmpty) name else s"$rel/$name", pv2)
          }
        } else if (name.endsWith(".parquet") &&
                   (subtree.isEmpty || rel.startsWith(subtree)))
          out += (((if (rel.isEmpty) name else s"$rel/$name"), pv,
            st.getLen, st.getModificationTime))
      }
    walk(root, "", Map.empty)
    out.toSeq
  }

  private[graft] def addAction(path: String, pv: Map[String, String],
                               size: Long, mtime: Long,
                               dv: Option[graft.sources.DeletionVectors.Descriptor] = None,
                               dataChange: Boolean = true): String = {
    // add.path is percent-encoded per the protocol (RFC 2396) — a
    // partition value with a space ("4-NOT SPECIFIED") must round-trip
    val encoded = new java.net.URI(null, null, path, null).toASCIIString
    val pvJson = pv.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString(",")
    val dvJson = dv.map { d =>
      s""","deletionVector":{"storageType":${jstr(d.storageType)},""" +
        s""""pathOrInlineDv":${jstr(d.pathOrInlineDv)}""" +
        d.offset.map(o => s""","offset":$o""").getOrElse("") +
        s""","sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
    }.getOrElse("")
    s"""{"add":{"path":${jstr(encoded)},"partitionValues":{$pvJson},""" +
      s""""size":$size,"modificationTime":$mtime,"dataChange":$dataChange$dvJson}}"""
  }

  /** Create a new Delta table at `table` (must not exist): one partitioned
    * parquet write + log version 0. */
  def create(df: DataFrame, table: String, partitionBy: Seq[String]): Unit = {
    val spark = df.sparkSession
    require(nextVersion(spark, table) == 0L, s"$table already has a Delta log")
    val writer = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(table)
    val files = writtenFiles(spark, table, "")
    val meta =
      s"""{"metaData":{"id":"graft-${math.abs(table.hashCode)}",""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(df.schema.json)},""" +
        s""""partitionColumns":[${partitionBy.map(jstr).mkString(",")}],""" +
        s""""configuration":{}}}"""
    writeVersion(spark, table, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta) ++
      files.map { case (p, pv, sz, mt) => addAction(p, pv, sz, mt) },
      operation = "CREATE TABLE AS SELECT")
  }

  /** Blind-APPEND `df` as a new log version (adds only, no removes —
    * the most common commit shape in a real log). Files land under a
    * fresh `append-v<N>` subtree so they never collide with live files;
    * partition values ride in the add actions' `partitionValues` (the
    * protocol's source of truth), not the directory layout. */
  def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log to append to")
    val sub = s"append-v$version"
    val writer = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(s"$table/$sub")
    val files = writtenFiles(spark, table, sub)
    writeVersion(spark, table, version,
      files.map { case (p, pv, sz, mt) => addAction(p, pv, sz, mt) },
      operation = "WRITE")
  }

  /** Streaming-sink append with SetTransaction EXACTLY-ONCE — Delta's
    * idempotent-writer mechanism: the commit carries a
    * `txn {appId, version}` action, and a writer about to commit batch
    * `txnVersion` first checks the table's replayed watermark for its
    * `appId` — a replayed micro-batch (watermark ≥ txnVersion) is
    * SKIPPED, so `foreachBatch { (b, id) => appendTxn(b, t, app, id) }`
    * over an at-least-once stream lands every batch exactly once, no
    * keyed merge required. Returns whether the batch was committed.
    * Watermarks survive checkpoint+vacuum (txn rows round-trip through
    * the checkpoint like every other action). */
  def appendTxn(df: DataFrame, table: String, appId: String, txnVersion: Long,
                partitionBy: Seq[String] = Nil): Boolean = {
    val spark = df.sparkSession
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log to append to")
    val last = DeltaRead.tableState(spark, table, version - 1).txns.get(appId)
    if (last.exists(_ >= txnVersion)) return false // replayed batch
    val sub = s"append-v$version"
    val writer = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(s"$table/$sub")
    val files = writtenFiles(spark, table, sub)
    writeVersion(spark, table, version,
      s"""{"txn":{"appId":${jstr(appId)},"version":$txnVersion}}""" +:
        files.map { case (p, pv, sz, mt) => addAction(p, pv, sz, mt) },
      operation = "STREAMING UPDATE")
    true
  }

  /** Replace ONE partition's contents with `df` as a new log version
    * (remove the partition's live files, add the rewrite). */
  def replacePartition(df: DataFrame, table: String,
                       partitionCol: String, value: String): Unit = {
    val spark = df.sparkSession
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log to append to")
    val live = DeltaRead.tableState(spark, table, version - 1).live
    val removed = live.filter(_.partitionValues.get(partitionCol).contains(value))
    require(removed.nonEmpty, s"no live files for $partitionCol=$value")
    // new files land inside the SAME hive dir; name them under a fresh
    // subdirectory so the rewrite never collides with the live files
    val sub = s"$partitionCol=$value/v$version"
    df.drop(partitionCol).write.mode("errorifexists")
      .parquet(s"$table/$sub")
    val files = writtenFiles(spark, table, sub)
      .map { case (p, _, size, mtime) =>
        (p, Map(partitionCol -> value), size, mtime)
      }
    writeVersion(spark, table, version, operation = "WRITE",
      lines = removed.map { r =>
        // partitionValues on the remove let CDF readers attach partition
        // columns to the delete rows without replaying earlier state
        val pvJson = r.partitionValues.map { case (k, v) =>
          s"${jstr(k)}:${jstr(Option(v).getOrElse(""))}"
        }.mkString(",")
        s"""{"remove":{"path":${jstr(r.path)},"dataChange":true,""" +
          s""""partitionValues":{$pvJson}}}"""
      } ++
        files.map { case (p, pv, sz, mt) => addAction(p, pv, sz, mt) })
  }

  /** Row-level UPDATE with CHANGE DATA FEED emission — Delta's
    * `UPDATE ... SET ... WHERE ...` commit shape: affected files are
    * REWRITTEN (remove + add, `dataChange=true`, carried-over rows
    * unchanged) and the commit also writes `_change_data/` cdc files
    * carrying the old rows as `update_preimage` and the new rows as
    * `update_postimage`, referenced by `cdc` actions — so CDF readers
    * and the `graft-delta` tail see exactly the row-level delta, never
    * a synthesized whole-file insert+delete. `condition` is a SQL
    * predicate over the DATA columns (NULL = not matched, like SQL
    * UPDATE); `set` maps column name → SQL expression over the old row
    * (type-preserving expressions are the caller's contract — the
    * declared schema stays authoritative). Files carrying deletion
    * vectors gate loudly (rewriting them would resurrect DV-deleted
    * rows). Driver state is the affected FILE list — bounded by file
    * count, the same grade as every Delta client's log state. */
  def updateWhere(spark: SparkSession, table: String, condition: String,
                  set: Map[String, String]): Unit = {
    import org.apache.spark.sql.functions._
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log")
    val state = DeltaRead.tableState(spark, table, version - 1)
    require(!state.configuration.get("delta.columnMapping.mode")
        .exists(_ != "none"),
      s"updateWhere over column-mapped $table is not supported — the " +
        "condition and rewrite would need physical-name routing")
    val live = state.live
    if (live.isEmpty) return
    val conf = spark.sparkContext.hadoopConfiguration
    def decode(rel: String): String =
      try Option(new java.net.URI(rel).getPath).getOrElse(rel)
      catch { case _: java.net.URISyntaxException => rel }
    def qualify(rel: String): Path = {
      val raw = decode(rel)
      val p = if (raw.startsWith("/")) new Path(raw) else new Path(table, raw)
      p.getFileSystem(conf).makeQualified(p)
    }
    val byQualified = live.map(f =>
      graft.sources.DeletionVectors.sparkPathString(qualify(f.path)) -> f).toMap
    // SQL-UPDATE null semantics: a NULL condition matches nothing
    val matched = coalesce(expr(condition), lit(false))
    val hitFiles = spark.read.parquet(live.map(f => qualify(f.path).toString): _*)
      .where(matched)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (hitFiles.isEmpty) return
    val affected = hitFiles.map(byQualified)
    affected.foreach(f => require(f.dv.isEmpty,
      s"updateWhere over deletion-vector carrying file ${f.path} is not " +
        "supported — rewriting it would resurrect DV-deleted rows"))
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    def pvJson(pv: Map[String, String]): String = pv.map { case (k, v) =>
      s"${jstr(k)}:${jstr(Option(v).getOrElse(""))}"
    }.mkString(",")
    affected.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sorted.mkString(","))
      .zipWithIndex.foreach { case ((pv, files), gi) =>
        val src = spark.read.parquet(files.map(f => qualify(f.path).toString): _*)
        val pre = src.where(matched)
        val keep = src.where(!matched)
        val post = set.foldLeft(pre) { case (d, (c, e)) =>
          d.withColumn(c, expr(e))
        }
        val dataSub = s"upd-v$version/g$gi"
        keep.unionByName(post).write.mode("errorifexists")
          .parquet(s"$table/$dataSub")
        val cdcSub = s"_change_data/upd-v$version/g$gi"
        pre.withColumn("_change_type", lit("update_preimage"))
          .unionByName(post.withColumn("_change_type", lit("update_postimage")))
          .write.mode("errorifexists").parquet(s"$table/$cdcSub")
        files.foreach(f => actions +=
          s"""{"remove":{"path":${jstr(f.path)},"dataChange":true,""" +
            s""""partitionValues":{${pvJson(f.partitionValues)}}}}""")
        writtenFiles(spark, table, dataSub).foreach { case (p, _, sz, mt) =>
          actions += addAction(p, pv, sz, mt)
        }
        writtenFiles(spark, table, cdcSub).foreach { case (p, _, sz, _) =>
          val encoded = new java.net.URI(null, null, p, null).toASCIIString
          actions += (s"""{"cdc":{"path":${jstr(encoded)},""" +
            s""""partitionValues":{${pvJson(pv)}},"size":$sz,""" +
            """"dataChange":false}}""")
        }
      }
    writeVersion(spark, table, version, actions.toSeq,
      operation = "UPDATE")
  }

  /** Keyed MERGE into a real Delta table — Delta as a CDC TARGET (the
    * fourth mirror leg next to the graft lake, Iceberg, and Hudi):
    * `batch` rows REPLACE same-key rows, `deleteKeys` rows hard-delete
    * theirs, and only the files HOLDING a matched key are rewritten
    * (remove + add, `dataChange=true`); new keys ride the same write.
    * With `emitCdc` the commit also writes `_change_data/` cdc files
    * with Delta MERGE's row classes — `update_preimage`/
    * `update_postimage` for replaced keys, `insert` for new ones,
    * `delete` (old values) for deleted ones — so CDF readers and the
    * `graft-delta` tail see the row-level delta.
    *
    * EXACTLY-ONCE via SetTransaction: the commit carries
    * `txn {appId, txnVersion}`; a replayed batch (watermark ≥
    * txnVersion... = txnVersion) is skipped before any byte is written,
    * and a txnVersion BEHIND the watermark fails loudly — that is a
    * reset checkpoint, and silently skipping would drop live batches
    * (same guard as the Iceberg/Hudi mirror legs). Returns whether the
    * batch committed.
    *
    * Scale shape (the HudiCowWrite plan on Delta's file model): the
    * key→file probe is ONE column-pruned scan semi-joined to the batch
    * keys (driver sees only the affected FILE list); carried rows come
    * from one multi-file scan anti-joined to the keys; the rewrite is
    * one write job (Delta has no file-group naming constraint, so no
    * per-group shuffle discipline is needed); cdc rows are one more
    * bounded write. Nothing row- or key-sized touches the driver.
    *
    * SCHEMA EVOLUTION (Delta's `mergeSchema` semantics): batch columns
    * ABSENT from the declared table schema extend it — appended after
    * the existing columns, a fresh `metaData` action carries the
    * evolved `schemaString`, and carried/old rows read back NULL for
    * the new columns. A batch MISSING declared non-key columns is also
    * fine (its rows land with NULLs) — so a mirror restarted with a
    * widened source schema evolves its replica in place. Same-name
    * columns with a DIFFERENT type fail loudly (silent coercion would
    * corrupt the replica).
    *
    * Scope: unpartitioned tables (the mirror-target shape this library
    * creates); DV-carrying affected files gate loudly like
    * [[updateWhere]]. `batch` and `deleteKeys` must be key-disjoint and
    * one-row-per-key (the mirror election guarantees both). */
  def merge(batch: DataFrame, deleteKeys: DataFrame, table: String,
            keyCols: Seq[String], appId: String, txnVersion: Long,
            emitCdc: Boolean = true): Boolean = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    require(keyCols.nonEmpty, "merge needs key columns")
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log (create the table first)")
    val state = DeltaRead.tableState(spark, table, version - 1)
    require(state.partitionCols.isEmpty,
      "merge targets unpartitioned tables (the mirror-target shape); " +
        s"$table partitions by ${state.partitionCols.mkString(",")}")
    require(!state.configuration.get("delta.columnMapping.mode")
        .exists(_ != "none"),
      s"merge into column-mapped $table is not supported — data writes " +
        "would need physical-name routing")
    state.txns.get(appId).foreach { w =>
      if (w > txnVersion) throw new IllegalStateException(
        s"merge stream '$appId' into $table: incoming txn $txnVersion is " +
          s"behind the committed watermark $w — the checkpoint was reset; " +
          "refusing to silently skip live batches as replays")
      if (w == txnVersion) return false // replayed batch
    }
    val live = state.live
    val conf = spark.sparkContext.hadoopConfiguration
    def decode(rel: String): String =
      try Option(new java.net.URI(rel).getPath).getOrElse(rel)
      catch { case _: java.net.URISyntaxException => rel }
    def qualify(rel: String): Path = {
      val raw = decode(rel)
      val p = if (raw.startsWith("/")) new Path(raw) else new Path(table, raw)
      p.getFileSystem(conf).makeQualified(p)
    }
    val keyed = batch.localCheckpoint(false)
    val delKeyed = deleteKeys.select(keyCols.map(col): _*).distinct()
      .localCheckpoint(false)
    val touchKeys = keyed.select(keyCols.map(col): _*)
      .unionByName(delKeyed).distinct()
    // ---- schema evolution (mergeSchema semantics) ----
    keyCols.foreach(k => require(batch.columns.contains(k),
      s"merge batch has no key column '$k'"))
    val declared = state.schemaString
      .map(org.apache.spark.sql.types.DataType.fromJson(_)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      .getOrElse(throw new IllegalStateException(
        s"$table has no schemaString in its metadata — cannot merge"))
    keyed.schema.fields.foreach { f =>
      declared.fields.find(_.name == f.name).foreach(d =>
        require(d.dataType == f.dataType,
          s"merge schema conflict on '${f.name}': table has ${d.dataType}, " +
            s"batch has ${f.dataType} — refusing to silently coerce"))
    }
    // evolved columns are FORCED nullable: rows written before the
    // evolution physically lack them and must read back NULL
    val newCols = keyed.schema.fields
      .filterNot(f => declared.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    val evolved = org.apache.spark.sql.types.StructType(
      declared.fields ++ newCols)
    /** Project `df` onto the evolved schema: absent columns become typed
      * NULLs, order follows the evolved schema. */
    def align(df: DataFrame): DataFrame = df.select(evolved.fields.toSeq.map {
      f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    actions += s"""{"txn":{"appId":${jstr(appId)},"version":$txnVersion}}"""
    if (evolved.length != declared.length)
      actions +=
        (s"""{"metaData":{"id":"graft-${math.abs(table.hashCode)}",""" +
          s""""format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${jstr(evolved.json)},""" +
          s""""partitionColumns":[],"configuration":{}}}""")
    val affected: Seq[DeltaRead.AddFile] =
      if (live.isEmpty) Nil
      else {
        val byQualified = live.map(f =>
          graft.sources.DeletionVectors.sparkPathString(qualify(f.path)) -> f)
          .toMap
        // ONE column-pruned probe: files holding any touched key (the
        // metadata column must resolve on the RELATION, before the join)
        val hit = spark.read.parquet(live.map(f => qualify(f.path).toString): _*)
          .select(col("_metadata.file_path").as("__graft_fp") +:
            keyCols.map(col): _*)
          .join(touchKeys, keyCols, "left_semi")
          .select(col("__graft_fp")).distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        hit.map(byQualified)
      }
    affected.foreach(f => require(f.dv.isEmpty,
      s"merge over deletion-vector carrying file ${f.path} is not " +
        "supported — rewriting it would resurrect DV-deleted rows"))
    val old =
      if (affected.isEmpty) None
      // mergeSchema: affected files may span schema generations (files
      // written before an evolution lack the newer columns physically)
      else Some(spark.read.option("mergeSchema", "true").parquet(
        affected.map(f => qualify(f.path).toString): _*))
    val carried = old.map(_.join(touchKeys, keyCols, "left_anti"))
    val out = carried.fold(align(keyed))(c =>
      align(c).unionByName(align(keyed)))
    val dataSub = s"merge-v$version"
    out.write.mode("errorifexists").parquet(s"$table/$dataSub")
    affected.foreach(f => actions +=
      s"""{"remove":{"path":${jstr(f.path)},"dataChange":true,""" +
        """"partitionValues":{}}}""")
    writtenFiles(spark, table, dataSub).foreach { case (p, _, sz, mt) =>
      actions += addAction(p, Map.empty, sz, mt)
    }
    if (emitCdc) {
      val oldMatched = old.map(_.join(
        keyed.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi"))
      // batch keys that already exist — bounded by BATCH size, so the
      // post/insert split joins against a batch-sized side (never a
      // broadcast of the affected files' full key set)
      val existingBatchKeys = old.map(o =>
        keyed.select(keyCols.map(col): _*).distinct()
          .join(o.select(keyCols.map(col): _*), keyCols, "left_semi"))
      val postimage = existingBatchKeys
        .map(ek => keyed.join(ek, keyCols, "left_semi"))
        .getOrElse(keyed.limit(0))
      val inserts = existingBatchKeys
        .map(ek => keyed.join(ek, keyCols, "left_anti"))
        .getOrElse(keyed)
      val deleted = old.map(_.join(delKeyed, keyCols, "left_semi"))
      val cdc = Seq(
        oldMatched.map(d =>
          align(d).withColumn("_change_type", lit("update_preimage"))),
        Some(align(postimage).withColumn("_change_type", lit("update_postimage"))),
        Some(align(inserts).withColumn("_change_type", lit("insert"))),
        deleted.map(d => align(d).withColumn("_change_type", lit("delete"))))
        .flatten.reduce(_.unionByName(_))
      val cdcSub = s"_change_data/merge-v$version"
      cdc.write.mode("errorifexists").parquet(s"$table/$cdcSub")
      writtenFiles(spark, table, cdcSub).foreach { case (p, _, sz, _) =>
        val encoded = new java.net.URI(null, null, p, null).toASCIIString
        actions += (s"""{"cdc":{"path":${jstr(encoded)},""" +
          """"partitionValues":{},"size":""" + sz + ""","dataChange":false}}""")
      }
    }
    writeVersion(spark, table, version, actions.toSeq,
      operation = "MERGE")
    true
  }

  /** Delete the rows matching `condition` (a SQL predicate over the DATA
    * columns — partition-column predicates are out of this fixture-grade
    * writer's scope) by attaching DELETION VECTORS: no data file is
    * rewritten; each affected file gets a `remove` + re-`add` carrying a
    * DV descriptor (protocol-upgraded to reader version 3 /
    * `deletionVectors`). Existing DVs are merged, exactly like a real
    * Delta DELETE.
    *
    * Scale shape: matched positions NEVER touch the driver — one
    * pushdown-capable scan materializes `(file, row_index)` pairs on
    * executors, existing DVs expand executor-side
    * ([[graft.sources.DeletionVectors.deletedRows]]) and union in, and
    * each affected file's merged bitmap is serialized AND written by the
    * executor holding its group
    * ([[graft.sources.DeletionVectors.writeFilesDistributed]]). The
    * driver sees only the affected FILE list and their descriptors —
    * the same metadata grade as the Delta log itself. */
  /** With `emitCdc=true`, the commit ALSO writes `_change_data/` cdc
    * files carrying exactly the NEWLY deleted rows (`_change_type` =
    * `delete` — rows already dead in a prior DV are not re-reported)
    * referenced by `cdc` actions, making DV deletes consumable by CDF
    * readers and the `graft-delta` tail (whose DV-without-cdc gate then
    * has nothing to fire on — cdc actions take precedence). Default
    * false preserves the bare-DV commit shape (and its loud gate). */
  def deleteWhere(spark: SparkSession, table: String, condition: String,
                  emitCdc: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log")
    val dwState = DeltaRead.tableState(spark, table, version - 1)
    require(!dwState.configuration.get("delta.columnMapping.mode")
        .exists(_ != "none"),
      s"deleteWhere over column-mapped $table is not supported — the " +
        "condition scan would need physical-name routing")
    val live = dwState.live
    val conf = spark.sparkContext.hadoopConfiguration
    // add.path is percent-encoded; decode with URI semantics (the mirror
    // of DeltaRead.resolvePath — URLDecoder would mangle literal '+')
    def decode(rel: String): String =
      try Option(new java.net.URI(rel).getPath).getOrElse(rel)
      catch { case _: java.net.URISyntaxException => rel }
    // _metadata.file_path is SparkPath-encoded (= Path.toUri.toString,
    // percent-encoded) — key the hit map in exactly that spelling, but
    // hand the reader the RAW decoded paths (it does not URI-decode)
    def qualify(rel: String): Path = {
      val raw = decode(rel)
      val p = if (raw.startsWith("/")) new Path(raw) else new Path(table, raw)
      p.getFileSystem(conf).makeQualified(p)
    }
    val byQualified = live.map(f =>
      graft.sources.DeletionVectors.sparkPathString(qualify(f.path)) -> f).toMap
    // matched positions stay ON EXECUTORS (localCheckpointed: the
    // hit-file list, DV union, and cdc anti-join all derive from one
    // materialization, not three condition scans)
    val matched = spark.read.parquet(live.map(f => qualify(f.path).toString): _*)
      .withColumn("__qualified", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
      .where(condition)
      .select("__qualified", "__pos")
      .localCheckpoint(false)
    // the affected FILE list — metadata-scale driver state
    val hitFiles = matched.select("__qualified").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (hitFiles.isEmpty) return
    val affected = hitFiles.map(q => q -> byQualified(q))
    // existing DVs on hit files expand executor-side and union in (a
    // second DELETE keeps earlier deletions)
    val existing = affected.collect { case (q, f) if f.dv.nonEmpty =>
      (q, f.dv.get)
    }
    val before = if (existing.isEmpty) None
      else Some(graft.sources.DeletionVectors.deletedRows(spark, table, existing)
        .localCheckpoint(false))
    val merged = before.fold(matched)(b => matched.unionByName(b))
    // one DV file per affected data file, serialized + written by the
    // executor holding its group; driver collects only descriptors
    val descByFile = graft.sources.DeletionVectors
      .writeFilesDistributed(spark, table, merged).toMap
    val protocol =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}"""
    val actions = affected.flatMap { case (q, f) =>
      // addAction re-encodes, so hand it the DECODED path (f.path is the
      // log's still-encoded spelling; remove must match it verbatim)
      Seq(s"""{"remove":{"path":${jstr(f.path)},"dataChange":true}}""",
        addAction(decode(f.path), f.partitionValues, f.size,
          f.modificationTime, Some(descByFile(q))))
    }
    val cdcActions = if (!emitCdc) Nil else {
      def pvJson(pv: Map[String, String]): String = pv.map { case (k, v) =>
        s"${jstr(k)}:${jstr(Option(v).getOrElse(""))}"
      }.mkString(",")
      // only rows dying IN THIS COMMIT: drop positions a prior DV holds
      val fresh = before.fold(matched)(b =>
        matched.join(b, Seq("__qualified", "__pos"), "left_anti"))
      affected.groupBy(_._2.partitionValues).toSeq
        .sortBy(_._1.toSeq.sorted.mkString(","))
        .zipWithIndex.flatMap { case ((pv, group), gi) =>
          val delRows = spark.read.parquet(
              group.map { case (_, f) => qualify(f.path).toString }: _*)
            .withColumn("__qualified", col("_metadata.file_path"))
            .withColumn("__pos", col("_metadata.row_index"))
            .join(fresh, Seq("__qualified", "__pos"), "left_semi")
            .drop("__qualified", "__pos")
            .withColumn("_change_type", lit("delete"))
          val cdcSub = s"_change_data/del-v$version/g$gi"
          delRows.write.mode("errorifexists").parquet(s"$table/$cdcSub")
          writtenFiles(spark, table, cdcSub).map { case (p, _, sz, _) =>
            val encoded = new java.net.URI(null, null, p, null).toASCIIString
            s"""{"cdc":{"path":${jstr(encoded)},""" +
              s""""partitionValues":{${pvJson(pv)}},"size":$sz,""" +
              """"dataChange":false}}"""
          }
        }
    }
    writeVersion(spark, table, version, (protocol +: actions) ++ cdcActions,
      operation = "DELETE")
  }

  /** SHALLOW CLONE — zero-copy table branching (Delta's
    * `CREATE TABLE ... SHALLOW CLONE src [VERSION AS OF v]`): the clone
    * is a NEW table whose version-0 log references the source's data
    * files by ABSOLUTE path — no byte of data moves, and writes to the
    * clone (appends, merges, deletes) never touch the source. The
    * branching primitive for training-data experiments: clone the
    * corpus table, mutate the clone, diff, throw it away. Deletion
    * vectors are carried (`p`-type absolute descriptors). Source
    * vacuums can orphan a clone's referenced files — same contract as
    * Delta's own shallow clones. */
  def shallowClone(spark: SparkSession, source: String, target: String,
                   versionAsOf: Option[Long] = None): Unit = {
    require(nextVersion(spark, target) == 0L,
      s"$target already has a Delta log")
    val srcVersion = versionAsOf.getOrElse(
      DeltaRead.latestVersion(spark, source))
    val state = DeltaRead.tableState(spark, source, srcVersion)
    val conf = spark.sparkContext.hadoopConfiguration
    def decode(rel: String): String =
      try Option(new java.net.URI(rel).getPath).getOrElse(rel)
      catch { case _: java.net.URISyntaxException => rel }
    def absolute(rel: String): String = {
      val raw = decode(rel)
      if (raw.startsWith("/")) raw
      else new Path(source, raw).getFileSystem(conf)
        .makeQualified(new Path(source, raw)).toUri.getPath
    }
    val meta = metaDataAction(target,
      state.schemaString.getOrElse(throw new IllegalStateException(
        s"$source@$srcVersion has no schemaString")),
      state.partitionCols, state.configuration)
    val protocol = state.protocol match {
      case Some(p) =>
        s"""{"protocol":{"minReaderVersion":${p.minReaderVersion},""" +
          s""""minWriterVersion":${p.minWriterVersion}""" +
          (if (p.readerFeatures.nonEmpty)
            s""","readerFeatures":[${p.readerFeatures.map(jstr).mkString(",")}]"""
          else "") +
          (if (p.writerFeatures.nonEmpty)
            s""","writerFeatures":[${p.writerFeatures.map(jstr).mkString(",")}]"""
          else "") + "}}"
      case None => """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    }
    val adds = state.live.map { f =>
      // DV descriptors: u-type (table-relative) become p-type absolute
      // so they keep resolving from the clone's root
      val dv = f.dv.map {
        case d if d.storageType == "u" =>
          d.copy(storageType = "p",
            pathOrInlineDv = graft.sources.DeletionVectors
              .filePath(source, d).toString)
        case d => d
      }
      addAction(absolute(f.path), f.partitionValues, f.size,
        f.modificationTime, dv, dataChange = true)
    }
    writeVersion(spark, target, 0L, Seq(protocol, meta) ++ adds,
      operation = "CLONE")
  }

  /** RESTORE TABLE ... TO VERSION AS OF `toVersion` — a NEW commit
    * whose live-file set equals the target version's (Delta's RESTORE:
    * time travel made durable, the recovery path after a bad write).
    * Files the current version added since are `remove`d, files the
    * target version held are re-`add`ed (original partition values,
    * sizes, mtimes, and deletion vectors), and a changed schema is
    * restored via the target's metaData. History is preserved — the
    * restore is itself a version, and a second restore can undo it.
    * Fails loudly when a required file was vacuumed away. */
  def restore(spark: SparkSession, table: String, toVersion: Long): Unit = {
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log")
    require(toVersion >= 0 && toVersion < version - 1,
      s"restore target $toVersion must be an EARLIER version (current: " +
        s"${version - 1})")
    val target = DeltaRead.tableState(spark, table, toVersion)
    val cur = DeltaRead.tableState(spark, table, version - 1)
    val conf = spark.sparkContext.hadoopConfiguration
    def decode(rel: String): String =
      try Option(new java.net.URI(rel).getPath).getOrElse(rel)
      catch { case _: java.net.URISyntaxException => rel }
    def qualify(rel: String): Path = {
      val raw = decode(rel)
      val p = if (raw.startsWith("/")) new Path(raw) else new Path(table, raw)
      p.getFileSystem(conf).makeQualified(p)
    }
    val curByPath = cur.live.map(f => f.path -> f).toMap
    val tgtByPath = target.live.map(f => f.path -> f).toMap
    // a path live in both but with a DIFFERENT deletion vector must be
    // re-added with the target's DV (row-level state is part of the
    // restored version)
    val removes = cur.live.filter(f =>
      !tgtByPath.contains(f.path) || tgtByPath(f.path).dv != f.dv)
    val adds = target.live.filter(f =>
      !curByPath.contains(f.path) || curByPath(f.path).dv != f.dv)
    adds.foreach { f =>
      val p = qualify(f.path)
      require(p.getFileSystem(conf).exists(p),
        s"restore to version $toVersion needs ${f.path}, which is gone " +
          "(vacuumed?) — restore within the vacuum retention window")
    }
    val metaAction =
      if (target.schemaString == cur.schemaString &&
          target.partitionCols == cur.partitionCols) Nil
      else Seq(metaDataAction(table,
        target.schemaString.getOrElse(throw new IllegalStateException(
          s"version $toVersion has no schemaString")),
        target.partitionCols, target.configuration))
    def pvJson(pv: Map[String, String]): String = pv.map { case (k, v) =>
      s"${jstr(k)}:${jstr(Option(v).getOrElse(""))}"
    }.mkString(",")
    val actions = metaAction ++
      removes.map(f =>
        s"""{"remove":{"path":${jstr(f.path)},"dataChange":true,""" +
          s""""partitionValues":{${pvJson(f.partitionValues)}}}}""") ++
      adds.map(f => addAction(decode(f.path), f.partitionValues, f.size,
        f.modificationTime, f.dv))
    require(actions.nonEmpty, s"restore to $toVersion is a no-op — the " +
      "live file set is already identical")
    writeVersion(spark, table, version, actions, operation = "RESTORE")
  }

  private def metaDataAction(table: String, schemaJson: String,
                             partitionCols: Seq[String],
                             configuration: Map[String, String]): String = {
    val conf = configuration.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString(",")
    s"""{"metaData":{"id":"graft-${math.abs(table.hashCode)}",""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jstr(schemaJson)},""" +
      s""""partitionColumns":[${partitionCols.map(jstr).mkString(",")}],""" +
      s""""configuration":{$conf}}}"""
  }

  /** Switch `table` to COLUMN MAPPING (`delta.columnMapping.mode` =
    * `name`, the protocol's rename-safe mode): every column's CURRENT
    * name is frozen as its `physicalName` (the spelling in the data
    * files) with a stable `columnMapping.id`, the table config records
    * the mode, and the protocol upgrades to reader 3 / writer 7 with
    * the `columnMapping` feature (existing features carried). After
    * this, [[renameColumn]] is a METADATA-ONLY commit — no data file is
    * touched, exactly Delta's own `ALTER TABLE ... RENAME COLUMN`.
    * Scope: reads and renames; subsequent data writes to a mapped
    * table would need physical-name routing and gate loudly in
    * [[merge]]/[[updateWhere]]/[[deleteWhere]]. */
  def enableColumnMapping(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.types._
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log")
    val state = DeltaRead.tableState(spark, table, version - 1)
    require(!state.configuration.get("delta.columnMapping.mode")
        .exists(_ != "none"),
      s"$table already uses column mapping")
    val declared = state.schemaString
      .map(DataType.fromJson(_).asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"$table has no schemaString in its metadata"))
    val mapped = StructType(declared.fields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putString("delta.columnMapping.physicalName", f.name)
        .putLong("delta.columnMapping.id", (i + 1).toLong).build())
    })
    val rf = (state.protocol.toSeq.flatMap(_.readerFeatures) :+
      "columnMapping").distinct
    val wf = (state.protocol.toSeq.flatMap(_.writerFeatures) :+
      "columnMapping").distinct
    val protocol =
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":[${rf.map(jstr).mkString(",")}],""" +
        s""""writerFeatures":[${wf.map(jstr).mkString(",")}]}}"""
    val conf = state.configuration +
      ("delta.columnMapping.mode" -> "name") +
      ("delta.columnMapping.maxColumnId" -> declared.fields.length.toString)
    writeVersion(spark, table, version, Seq(protocol,
      metaDataAction(table, mapped.json, state.partitionCols, conf)),
      operation = "SET TBLPROPERTIES")
  }

  /** Rename a top-level column — METADATA ONLY (requires
    * [[enableColumnMapping]] first): the logical name changes in the
    * declared schema, the frozen `physicalName` keeps resolving the
    * data files, and every prior version's files read back correctly
    * under the new name. */
  def renameColumn(spark: SparkSession, table: String, from: String,
                   to: String): Unit = {
    import org.apache.spark.sql.types._
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log")
    val state = DeltaRead.tableState(spark, table, version - 1)
    require(state.configuration.get("delta.columnMapping.mode")
        .exists(_ != "none"),
      s"renameColumn requires column mapping — run enableColumnMapping " +
        s"on $table first")
    val declared = state.schemaString
      .map(DataType.fromJson(_).asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"$table has no schemaString in its metadata"))
    require(declared.fieldNames.contains(from),
      s"$table has no column '$from'")
    require(!declared.fieldNames.contains(to),
      s"$table already has a column '$to'")
    require(!state.partitionCols.exists(_.equalsIgnoreCase(from)),
      "renaming a partition column is not supported (directory layout " +
        "and partitionValues keys would need rewriting)")
    val renamed = StructType(declared.fields.map(f =>
      if (f.name == from) f.copy(name = to) else f))
    writeVersion(spark, table, version, Seq(
      metaDataAction(table, renamed.json, state.partitionCols,
        state.configuration)), operation = "RENAME COLUMN")
  }

  /** OPTIMIZE — bin-packing compaction: rewrite each partition's live
    * files into (at most) `filesPerPartition` outputs, committed as a
    * new version whose remove/add actions carry `dataChange=false`.
    * The snapshot is IDENTICAL before and after; CDF and the streaming
    * tails emit NOTHING for the version (Delta's own OPTIMIZE
    * contract — `changeFiles` skips dataChange=false actions). Old
    * files stay on disk for time travel until a vacuum. Tables with
    * deletion vectors are gated loudly: compacting without
    * materializing the DVs would resurrect deleted rows. */
  /** With `zorderBy` non-empty, rewritten files are additionally
    * Z-ORDER clustered on those columns ([[Clustering.zValue]]'s
    * interleaved-bit key, range-partitioned + sorted within files) —
    * Delta's `OPTIMIZE ... ZORDER BY`: range predicates on ANY of the
    * clustered columns prune files via min/max statistics, not just the
    * leading one. */
  def optimize(spark: SparkSession, table: String,
               filesPerPartition: Int = 1,
               zorderBy: Seq[String] = Nil): Unit = {
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log")
    val state = DeltaRead.tableState(spark, table, version - 1)
    require(state.live.forall(_.dv.isEmpty),
      "OPTIMIZE over deletion-vector carrying files is not supported — " +
        "compaction without materializing the DVs would resurrect " +
        "deleted rows; rewrite the DVs away first (deleteWhere + manual " +
        "rewrite)")
    val conf = spark.sparkContext.hadoopConfiguration
    def decode(rel: String): String =
      try Option(new java.net.URI(rel).getPath).getOrElse(rel)
      catch { case _: java.net.URISyntaxException => rel }
    def qualify(rel: String): Path = {
      val raw = decode(rel)
      val p = if (raw.startsWith("/")) new Path(raw) else new Path(table, raw)
      p.getFileSystem(conf).makeQualified(p)
    }
    val fsys = new Path(table).getFileSystem(conf)
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    state.live.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sorted.mkString(","))
      .zipWithIndex.foreach { case ((pv, files), gi) =>
        if (files.size > filesPerPartition || zorderBy.nonEmpty) {
          val sub = s"opt-v$version/g$gi"
          val group = spark.read.parquet(
            files.map(f => qualify(f.path).toString): _*)
          val packed =
            if (zorderBy.isEmpty) group.coalesce(filesPerPartition)
            else {
              val z = Clustering.withZValue(group, zorderBy)
              z.repartitionByRange(filesPerPartition,
                org.apache.spark.sql.functions.col("_graft_z"))
                .sortWithinPartitions("_graft_z")
                .drop("_graft_z")
            }
          packed.write.mode("errorifexists").parquet(s"$table/$sub")
          val written = fsys.listStatus(new Path(table, sub))
            .filter(_.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName)
          files.foreach { f =>
            val pvJson = f.partitionValues.map { case (k, v) =>
              s"${jstr(k)}:${jstr(Option(v).getOrElse(""))}"
            }.mkString(",")
            actions += s"""{"remove":{"path":${jstr(f.path)},""" +
              s""""dataChange":false,"partitionValues":{$pvJson}}}"""
          }
          written.foreach { st =>
            actions += addAction(s"$sub/${st.getPath.getName}", pv,
              st.getLen, st.getModificationTime, dataChange = false)
          }
        }
      }
    require(actions.nonEmpty,
      s"nothing to optimize: every partition already has <= " +
        s"$filesPerPartition files")
    writeVersion(spark, table, version, actions.toSeq,
      operation = "OPTIMIZE")
  }

  /** REORG TABLE … APPLY (PURGE) — materialize deletion vectors: every
    * live file carrying a DV is rewritten WITHOUT its deleted rows;
    * DV-free files are untouched. The commit's remove/add actions carry
    * `dataChange=false` — the snapshot is IDENTICAL before and after, so
    * CDF and the streaming tails emit nothing for the purge version
    * (Delta's own REORG contract, same as [[optimize]]). After a purge
    * the table holds no live DVs: [[optimize]]'s no-DV gate passes and
    * [[vacuumData]] reclaims both the superseded data files and their
    * now-unreferenced DV bitmap files — the step that completes the
    * DV lifecycle (deleteWhere → purge → optimize → vacuum).
    *
    * Scale shape: one DV anti-join scan per partition rewrite group —
    * deleted positions expand executor-side
    * ([[graft.sources.DeletionVectors.deletedRows]]) and never touch the
    * driver; the driver handles only file-level metadata. */
  def purgeDeletionVectors(spark: SparkSession, table: String,
                           filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions._
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val version = nextVersion(spark, table)
    require(version > 0L, s"$table has no Delta log")
    val state = DeltaRead.tableState(spark, table, version - 1)
    val dvFiles = state.live.filter(_.dv.isDefined)
    require(dvFiles.nonEmpty,
      s"nothing to purge: no live file in $table carries a deletion vector")
    val conf = spark.sparkContext.hadoopConfiguration
    def decode(rel: String): String =
      try Option(new java.net.URI(rel).getPath).getOrElse(rel)
      catch { case _: java.net.URISyntaxException => rel }
    def qualify(rel: String): Path = {
      val raw = decode(rel)
      val p = if (raw.startsWith("/")) new Path(raw) else new Path(table, raw)
      p.getFileSystem(conf).makeQualified(p)
    }
    val fsys = new Path(table).getFileSystem(conf)
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    dvFiles.groupBy(_.partitionValues).toSeq
      .sortBy(_._1.toSeq.sorted.mkString(","))
      .zipWithIndex.foreach { case ((pv, files), gi) =>
        val seeds = files.map(f =>
          (graft.sources.DeletionVectors.sparkPathString(qualify(f.path)),
            f.dv.get))
        val deleted =
          graft.sources.DeletionVectors.deletedRows(spark, table, seeds)
        val survivors = spark.read.parquet(
            files.map(f => qualify(f.path).toString): _*)
          .withColumn("__qualified", col("_metadata.file_path"))
          .withColumn("__pos", col("_metadata.row_index"))
          .join(deleted, Seq("__qualified", "__pos"), "left_anti")
          .drop("__qualified", "__pos")
        val sub = s"purge-v$version/g$gi"
        survivors.coalesce(filesPerPartition)
          .write.mode("errorifexists").parquet(s"$table/$sub")
        files.foreach { f =>
          val pvJson = f.partitionValues.map { case (k, v) =>
            s"${jstr(k)}:${jstr(Option(v).getOrElse(""))}"
          }.mkString(",")
          actions += s"""{"remove":{"path":${jstr(f.path)},""" +
            s""""dataChange":false,"partitionValues":{$pvJson}}}"""
        }
        val written = fsys.listStatus(new Path(table, sub))
          .filter(_.getPath.getName.endsWith(".parquet"))
          .sortBy(_.getPath.getName)
        written.foreach { st =>
          actions += addAction(s"$sub/${st.getPath.getName}", pv,
            st.getLen, st.getModificationTime, dataChange = false)
        }
      }
    writeVersion(spark, table, version, actions.toSeq,
      operation = "REORG")
  }

  /** Write a parquet checkpoint of the CURRENT version + `_last_checkpoint`
    * (what lets [[DeltaRead]] — and any Delta client — read the table
    * after early JSON versions are vacuumed). */
  def checkpoint(spark: SparkSession, table: String): Unit = {
    val version = nextVersion(spark, table) - 1
    require(version >= 0, s"$table has no Delta log")
    val state = DeltaRead.tableState(spark, table, version)
    val (live, partitionCols, schemaString, configuration) =
      (state.live, state.partitionCols, state.schemaString, state.configuration)
    import spark.implicits._
    // round-trip the table's REPLAYED protocol verbatim — re-synthesizing
    // it from what this writer understands would downgrade a foreign
    // table's features (columnMapping, timestampNtz, …) in the
    // checkpoint and mis-gate post-vacuum readers. Logs from legacy
    // writers with no protocol action at all fall back to a synthesized
    // one (DV-aware: dropping reader-v3 would resurrect deleted rows).
    val hasDv = live.exists(_.dv.isDefined)
    val proto = state.protocol match {
      case Some(p) => CpProto(p.minReaderVersion, p.minWriterVersion,
        Some(p.readerFeatures).filter(_.nonEmpty),
        Some(p.writerFeatures).filter(_.nonEmpty))
      case None =>
        if (hasDv) CpProto(3, 7, Some(Seq("deletionVectors")), Some(Seq("deletionVectors")))
        else CpProto(1, 2, None, None)
    }
    val rows: Seq[CpRow] =
      Seq(CpRow(Some(proto), None, None),
        CpRow(None, Some(CpMeta("graft-cp", partitionCols, schemaString,
          if (configuration.isEmpty) None else Some(configuration))), None)) ++
        live.map(f => CpRow(None, None,
          Some(CpAdd(f.path, f.partitionValues.map { case (k, v) =>
            k -> Option(v).getOrElse("")
          }, f.size, f.modificationTime,
            f.dv.map(d => CpDv(d.storageType, d.pathOrInlineDv, d.offset,
              d.sizeInBytes, d.cardinality)))))) ++
        state.txns.toSeq.sortBy(_._1).map { case (appId, v) =>
          CpRow(None, None, None, Some(CpTxn(appId, v)))
        }
    val cp = rows.toDS().toDF()
    val dir = logDir(table)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, s".cp-tmp-$version")
    cp.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("checkpoint write produced no parquet"))
    val target = new Path(dir, f"$version%020d.checkpoint.parquet")
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(part, target)
    fs.delete(tmp, true)
    val out = fs.create(new Path(dir, "_last_checkpoint"), true)
    try out.write(s"""{"version":$version,"size":${rows.size}}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** VACUUM data files — the space-reclamation half of the table
    * services next to [[vacuumLog]]: delete every data file under the
    * table that is NOT referenced (as a live file or its deletion
    * vector) by any version in the retained window
    * `[current − retainVersions + 1, current]`. Versions in the window
    * already log-vacuumed contribute nothing (their state is
    * unreachable anyway). Irreversible: time travel BEFORE the window
    * dies — exactly Delta's VACUUM trade-off, with a version-window
    * retention instead of wall-clock hours (deterministic, testable).
    * Dot/underscore-prefixed top-level entries (`_delta_log`,
    * `_change_data`, hidden dirs) are never touched. Listing runs
    * executor-parallel for big tables ([[graft.sources
    * .ParallelListing]]); the referenced set is the driver-side log
    * state every client holds, bounded by [[DeltaRead]]'s maxFiles.
    * Returns the number of deleted files. */
  def vacuumData(spark: SparkSession, table: String,
                 retainVersions: Int = 1): Int = {
    require(retainVersions >= 1, "retainVersions must be >= 1")
    val current = DeltaRead.latestVersion(spark, table)
    val floor = math.max(0L, current - (retainVersions - 1))
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(p: Path): String =
      p.getFileSystem(conf).makeQualified(p).toString
    val referenced = scala.collection.mutable.Set.empty[String]
    (floor to current).foreach { v =>
      val replayable =
        try Some(DeltaRead.tableState(spark, table, v))
        catch {
          // a log-vacuumed version inside the window has no state left
          // to reference; the CURRENT version must always replay
          case e: IllegalArgumentException if v < current &&
            e.getMessage.contains("missing") => None
        }
      replayable.foreach(_.live.foreach { f =>
        referenced += qualified(DeltaRead.resolvePath(table, f.path))
        f.dv.filter(d => d.storageType == "u" || d.storageType == "p")
          .foreach { d =>
            referenced += qualified(
              graft.sources.DeletionVectors.filePath(table, d))
          }
      })
    }
    val listed = graft.sources.ParallelListing.listFiles(spark, table,
      name => name.startsWith("_") || name.startsWith("."),
      maxFiles = 10000000)
    val fsys = new Path(table).getFileSystem(conf)
    var deleted = 0
    listed.foreach { l =>
      // only data artifacts are candidates — hidden files (checksum
      // sidecars, stray logs) are never counted, and a deleted file
      // takes its Hadoop .crc sidecar with it
      val isData = !l.name.startsWith(".") &&
        (l.name.endsWith(".parquet") || l.name.endsWith(".bin"))
      if (isData && !referenced.contains(qualified(new Path(l.path)))) {
        if (fsys.delete(new Path(l.path), false)) deleted += 1
        val crc = new Path(new Path(l.path).getParent, s".${l.name}.crc")
        if (fsys.exists(crc)) { fsys.delete(crc, false); () }
      }
    }
    deleted
  }

  /** Drop JSON versions ≤ the newest checkpoint (log vacuum) — readers
    * must replay from the checkpoint afterwards. */
  def vacuumLog(spark: SparkSession, table: String): Unit = {
    val dir = logDir(table)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cpVersions = fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
      case n if n.endsWith(".checkpoint.parquet") =>
        n.stripSuffix(".checkpoint.parquet").toLong
    }.toSeq
    require(cpVersions.nonEmpty, "vacuumLog needs a checkpoint first")
    val floor = cpVersions.max
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit) &&
          n.stripSuffix(".json").toLong <= floor)
        fs.delete(st.getPath, false)
    }
  }
}
