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

  /** One write stat for the commit body: partition-relative dir, file
    * id, TABLE-relative path, byte size. */
  private[sink] final case class WriteStat(partition: String, fileId: String,
                                           path: String, size: Long)

  /** Complete `instant` on the timeline. `stats` (when the writer knows
    * its files — every graft writer does) land as Hudi's own
    * `partitionToWriteStats` commit metadata, which makes the commit
    * JSONs a LISTING-FREE file manifest: [[graft.sources.HudiRead]]
    * builds its file-slice view from them instead of walking partition
    * directories — at 10⁶ cloud-store objects the directory listing is
    * the read-path bottleneck the real Hudi reader avoids via its
    * metadata table, and the same commit metadata serves that role
    * here. */
  private[sink] def completeInstant(spark: SparkSession, table: String,
                                    instant: String, action: String,
                                    stats0: Seq[WriteStat] = Nil): Unit = {
    val dir = new Path(table, ".hoodie")
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val marker = new Path(dir, s"$instant.$action")
    // a re-completed instant (several single-group writes sharing one
    // instant — the fixture pattern) MERGES its stats with the ones
    // already on the timeline; clobbering would blind the listing-free
    // reader to the earlier files
    val prior: Seq[WriteStat] =
      if (!f.exists(marker)) Nil
      else {
        val in = f.open(marker)
        val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
        val node = Option(graft.sources.DocPushdown.jsonMapper.readTree(json)
          .get("partitionToWriteStats")).filterNot(_.isNull)
        import scala.jdk.CollectionConverters._
        node.toSeq.flatMap(_.fields().asScala.flatMap { e =>
          e.getValue.elements().asScala.map { st =>
            WriteStat(e.getKey, st.get("fileId").asText(),
              st.get("path").asText(),
              Option(st.get("fileSizeInBytes")).map(_.asLong()).getOrElse(-1L))
          }
        }.toSeq)
      }
    val stats = (prior ++ stats0)
      .groupBy(_.path).map(_._2.last).toSeq // newest stat per path wins
    val body =
      if (stats.isEmpty) "{}"
      else {
        def js(s: String) =
          graft.sources.DocPushdown.jsonMapper.writeValueAsString(s)
        val parts = stats.groupBy(_.partition).toSeq.sortBy(_._1)
          .map { case (part, ss) =>
            val arr = ss.sortBy(_.path).map(st =>
              s"""{"fileId":${js(st.fileId)},"path":${js(st.path)},""" +
                s""""partitionPath":${js(part)},"fileSizeInBytes":${st.size}}""")
              .mkString("[", ",", "]")
            s"${js(part)}:$arr"
          }.mkString(",")
        s"""{"partitionToWriteStats":{$parts}}"""
      }
    val out = f.create(new Path(dir, s"$instant.$action"), true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
  }

  /** Initial base file: `df` written as ONE base parquet for file group
    * `fileId` at `instant`, committed on the timeline. The frame must
    * already carry the `_hoodie_record_key` / `_hoodie_commit_time` meta
    * columns (like every meta-field Hudi table). */
  def writeBase(df: DataFrame, table: String, partition: String,
                fileId: String, instant: String): Unit = {
    val stat = writeBaseFile(df, table, partition, fileId, instant)
    completeInstant(df.sparkSession, table, instant, "commit", Seq(stat))
  }

  /** One base parquet for `fileId` at `instant`, NO timeline commit —
    * multi-group commits ([[HudiCowWrite.upsert]]) write all their
    * files first and complete the instant once. Returns the write stat
    * for the commit body. */
  private[sink] def writeBaseFile(df: DataFrame, table: String,
                                  partition: String, fileId: String,
                                  instant: String): WriteStat = {
    val spark = df.sparkSession
    val partDir = new Path(table, partition)
    val tmp = new Path(table, s".base-tmp-$instant-$fileId")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val f = fs(spark, partDir)
    f.mkdirs(partDir)
    val part = f.listStatus(tmp).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("base write produced no parquet"))
    val name = s"${fileId}_0-1-2_$instant.parquet"
    val dest = new Path(partDir, name)
    f.rename(part, dest)
    f.delete(tmp, true)
    WriteStat(partition, fileId,
      if (partition.isEmpty) name else s"$partition/$name",
      f.getFileStatus(dest).getLen)
  }

  /** Append `df`'s rows as ONE Avro log block on `fileId`'s log stream
    * (delta commit at `instant`). Rows are encoded with an Avro schema
    * derived from the frame (strings/longs/doubles/ints/booleans — the
    * meta-column + payload shapes Hudi logs carry). FIXTURE-SCOPE ONLY
    * (hence `private[graft]`): this variant collects the frame to the
    * driver to cut one block by hand — the production ingest path is
    * [[appendLogDistributed]], which encodes blocks executor-side and
    * never moves row data through the driver. */
  private[graft] def appendLog(df: DataFrame, table: String, partition: String,
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
    val stat = writeLogBlock(spark, table, partition, fileId, baseInstant,
      logVersion, block)
    completeInstant(spark, table, instant, "deltacommit", Seq(stat))
  }

  /** Append a DELETE block (0.9-vintage Kryo `HoodieKey[]` payload,
    * [[HudiLogFormat.deleteBlock]]) on `fileId`'s log stream: hard-deletes
    * the given record keys at `instant` — the second way Hudi expresses
    * row deletes next to `_hoodie_is_deleted` payloads. FIXTURE-SCOPE
    * ONLY (hence `private[graft]`): the driver-side `Seq` invites a
    * `collect()` at the call site; the production spelling is the
    * [[appendDeleteLog(keys:org\.apache\.spark\.sql\.DataFrame*
    * DataFrame overload]], which never moves keys through the driver. */
  private[graft] def appendDeleteLog(spark: SparkSession,
                      keys: Seq[(String, String)],
                      table: String, partition: String, fileId: String,
                      baseInstant: String, instant: String,
                      logVersion: Int = 2): Unit = {
    val stat = writeLogBlock(spark, table, partition, fileId, baseInstant,
      logVersion, HudiLogFormat.deleteBlock(instant, keys))
    completeInstant(spark, table, instant, "deltacommit", Seq(stat))
  }

  /** DataFrame spelling of the delete block — the at-scale path:
    * `keys` (ONE string column of record keys) never moves through the
    * driver; a single task folds them into the block and writes the
    * log file EXECUTOR-side (a delete block is one contiguous region,
    * so one writer per block is the format's own unit — key volume is
    * bounded by block size, not by driver memory), and the driver only
    * completes the instant with the returned stat. */
  def appendDeleteLog(keys: DataFrame, table: String, partition: String,
                      fileId: String, baseInstant: String, instant: String,
                      logVersion: Int): Unit = {
    val spark = keys.sparkSession
    require(keys.schema.fields.length == 1 &&
      keys.schema.fields(0).dataType ==
        org.apache.spark.sql.types.StringType,
      s"keys must be one string column, got ${keys.schema.simpleString}")
    val name = s".${fileId}_$baseInstant.log.${logVersion}_0-1-2"
    val rel = if (partition.isEmpty) name else s"$partition/$name"
    import scala.jdk.CollectionConverters._
    val props = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray)
    val abs = new Path(table, rel).toString
    val sizes = keys.na.drop().coalesce(1).rdd.mapPartitions { it =>
      val ks = it.map(r => (r.getString(0), partition)).toSeq
      if (ks.isEmpty) Iterator.empty
      else {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        props.value.foreach { case (k, v) => conf.set(k, v) }
        val p = new Path(abs)
        val f = p.getFileSystem(conf)
        val out = new java.io.DataOutputStream(f.create(p, true))
        try HudiLogFormat.writeBlock(out,
          HudiLogFormat.deleteBlock(instant, ks))
        finally out.close()
        Iterator.single(f.getFileStatus(p).getLen)
      }
    }.collect() // bounded: one file length
    if (sizes.isEmpty) return // empty batch: no block, no instant
    completeInstant(spark, table, instant, "deltacommit",
      Seq(WriteStat(partition, fileId, rel, sizes.head)))
  }

  def appendDeleteLog(keys: DataFrame, table: String, partition: String,
                      fileId: String, baseInstant: String,
                      instant: String): Unit =
    appendDeleteLog(keys, table, partition, fileId, baseInstant, instant,
      logVersion = 2)

  /** One DELTA COMMIT appending each touched partition's rows as ONE
    * Avro log block on that partition's file group, written EXECUTOR-
    * SIDE — the MOR ingest shape (an upsert batch lands as log appends,
    * NO base rewrite; merge-on-read resolves latest-per-key and
    * [[HudiCompact]] folds periodically). Deletes ride along as
    * `_hoodie_is_deleted = true` tombstone rows (the payload-level
    * delete Hudi's merge honours), so one block type carries the whole
    * change batch.
    *
    * Scale shape: the driver plans only the per-partition group table
    * (fileId, base instant, next log version — file-listing metadata)
    * and completes the instant; rows shuffle once by partition and each
    * task encodes + writes its partitions' blocks directly (no
    * driver-side row collect, unlike the single-group [[appendLog]]
    * fixture path). One file group per partition — log appends never
    * fan a partition out, matching this writer's single-group layout;
    * partitions NEW to the table open a LOG-ONLY group (the reader
    * merges those without a base).
    *
    * Returns false when `instant` is already on the timeline. */
  def appendLogDistributed(df: DataFrame, table: String, partCol: String,
                           instant: String,
                           maxFiles: Int = 1000000,
                           maxBlockRecords: Int = 100000): Boolean = {
    val spark = df.sparkSession
    require(instant.nonEmpty && instant.forall(_.isDigit),
      s"instant must be a numeric timeline string, got '$instant'")
    val hoodie = new Path(table, ".hoodie")
    val f = fs(spark, hoodie)
    if (!f.exists(hoodie)) {
      f.mkdirs(hoodie)
      val out = f.create(new Path(hoodie, "hoodie.properties"), true)
      try out.write(
        "hoodie.table.name=graft\nhoodie.table.type=MERGE_ON_READ\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } else if (graft.sources.HudiRead.completedInstants(spark, table)
        .contains(instant))
      return false // replayed batch: the timeline is the watermark
    val parts = df.select(partCol).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    require(parts.forall(_ != null), "null partition value in MOR append")
    // per-partition group plan: existing single group (base or log-only)
    // or a fresh log-only group; next log version from the listing
    val listed = graft.sources.HudiRead.listAllFiles(spark, table, maxFiles)
    val baseRe = """([^_/]+)_[^_/]+_(\d+)\.parquet""".r
    val groupOf = scala.collection.mutable.Map.empty[String, (String, String)]
    val maxVer = scala.collection.mutable.Map.empty[(String, String), Int]
    listed.foreach { l =>
      l.name match {
        case baseRe(fid, inst) =>
          groupOf.get(l.rel) match {
            case Some((existing, bi)) =>
              require(existing == fid,
                s"partition ${l.rel} holds multiple file groups " +
                  s"($existing, $fid) — the MOR log-append path writes " +
                  "single-group partitions")
              if (graft.sources.HudiRead.instantKey(inst) >
                  graft.sources.HudiRead.instantKey(bi))
                groupOf(l.rel) = (fid, inst)
            case None => groupOf(l.rel) = (fid, inst)
          }
        case _ => HudiLogFormat.parseLogFileName(l.name).foreach {
          case (fid, bi, ver, _) =>
            if (!groupOf.contains(l.rel)) groupOf(l.rel) = (fid, bi)
            val k = (l.rel, fid)
            maxVer(k) = math.max(maxVer.getOrElse(k, 0), ver)
        }
      }
    }
    val plan: Map[String, (String, String, Int)] = parts.map { p =>
      val (fid, bi) = groupOf.getOrElse(p, (s"fg-$instant", instant))
      p -> (fid, bi, maxVer.getOrElse((p, fid), 0) + 1)
    }.toMap
    // nullable unions: tombstone rows carry null payload columns
    val schema = avroSchemaOf(df.drop(partCol), nullable = true)
    val schemaJson = schema.toString
    val fieldNames = df.drop(partCol).schema.fieldNames.toSeq
    import scala.jdk.CollectionConverters._
    val props = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray)
    val planB = spark.sparkContext.broadcast(plan)
    val partIdx = df.schema.fieldIndex(partCol)
    // rows STREAM through each task: sorted by partition so boundaries
    // cut files, blocks cut every maxBlockRecords — task memory is one
    // block, never a partition's rows (the Hudi log format reads
    // several same-instant blocks per file in order, so chunking is
    // invisible to the merge)
    val blockRecords = math.max(1, maxBlockRecords)
    df.repartition(org.apache.spark.sql.functions.col(partCol))
      .sortWithinPartitions(org.apache.spark.sql.functions.col(partCol))
      .foreachPartition { (rows: Iterator[Row]) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        props.value.foreach { case (k, v) => conf.set(k, v) }
        val sch = new Schema.Parser().parse(schemaJson)
        val buf = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
        var curPart: String = null
        var out: java.io.DataOutputStream = null
        def flushBlock(): Unit = if (buf.nonEmpty) {
          HudiLogFormat.writeBlock(out,
            HudiLogFormat.avroDataBlock(instant, sch, buf.toSeq))
          buf.clear()
        }
        def closePart(): Unit = {
          flushBlock()
          if (out != null) { out.close(); out = null }
        }
        try {
          rows.foreach { r =>
            val part = r.getString(partIdx)
            if (part != curPart) {
              closePart()
              val (fid, bi, ver) = planB.value(part)
              val logPath = new Path(new Path(table, part),
                s".${fid}_$bi.log.${ver}_0-1-2")
              val pfs = logPath.getFileSystem(conf)
              pfs.mkdirs(logPath.getParent)
              out = new java.io.DataOutputStream(pfs.create(logPath, true))
              curPart = part
            }
            val b = new GenericRecordBuilder(sch)
            fieldNames.foreach(n => b.set(n, r.getAs[Any](n)))
            buf += b.build()
            if (buf.size >= blockRecords) flushBlock()
          }
        } finally closePart()
      }
    // commit metadata: the PLAN names every log file this instant wrote
    // (partition → fid/bi/ver is driver state already); sizes are one
    // metadata stat per touched partition — the same O(P) grade as the
    // plan itself
    val tfs = fs(spark, new Path(table))
    val stats = parts.map { p =>
      val (fid, bi, ver) = plan(p)
      val name = s".${fid}_$bi.log.${ver}_0-1-2"
      val rel = if (p.isEmpty) name else s"$p/$name"
      // every planned partition had rows, so its log file must exist —
      // a missing one means the write silently failed; fail the commit
      WriteStat(p, fid, rel, tfs.getFileStatus(new Path(table, rel)).getLen)
    }
    completeInstant(spark, table, instant, "deltacommit", stats)
    true
  }

  private def writeLogBlock(spark: SparkSession, table: String,
                            partition: String, fileId: String,
                            baseInstant: String, logVersion: Int,
                            block: HudiLogFormat.LogBlock): WriteStat = {
    val name = s".${fileId}_$baseInstant.log.${logVersion}_0-1-2"
    val logPath = new Path(new Path(table, partition), name)
    val f = fs(spark, logPath)
    val out = new java.io.DataOutputStream(f.create(logPath, true))
    try HudiLogFormat.writeBlock(out, block) finally out.close()
    WriteStat(partition, fileId,
      if (partition.isEmpty) name else s"$partition/$name",
      f.getFileStatus(logPath).getLen)
  }

  private def avroSchemaOf(df: DataFrame, nullable: Boolean = false): Schema = {
    import org.apache.spark.sql.types._
    val fields = df.schema.fields.map { f =>
      val t0 = f.dataType match {
        case StringType => "\"string\""
        case LongType => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType => "\"double\""
        case FloatType => "\"float\""
        case BooleanType => "\"boolean\""
        case other => throw new IllegalArgumentException(
          s"unsupported log column type $other for ${f.name}")
      }
      val t = if (nullable) s"""["null",$t0]""" else t0
      val dflt = if (nullable) ""","default":null""" else ""
      s"""{"name":${quote(f.name)},"type":$t$dflt}"""
    }
    new Schema.Parser().parse(
      s"""{"type":"record","name":"graft_mor","fields":[${fields.mkString(",")}]}""")
  }

  private def quote(s: String): String =
    graft.sources.DocPushdown.jsonMapper.writeValueAsString(s)
}
