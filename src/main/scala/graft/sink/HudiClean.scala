package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.HudiRead

/** Hudi CLEAN table service — the third retention service next to
  * [[DeltaWrite.vacuumData]] (Delta VACUUM) and [[IcebergExpire]]
  * (snapshot expiry): deletes file-slice versions no snapshot inside
  * the retention window can reference, Hudi's
  * `KEEP_LATEST_FILE_VERSIONS` policy.
  *
  * Per (partition, fileId) file group:
  *  - the newest `retainVersions` COMPLETED base files survive; older
  *    bases are deleted;
  *  - log files whose `baseInstant` predates the group's oldest
  *    retained base are deleted too — a compaction's new base already
  *    folded them;
  *  - groups REPLACED by a clustering/overwrite `replacecommit` are
  *    invisible at the tip: all their completed-instant files go.
  *
  * Inflight writes are untouched — only files whose instant is a
  * COMPLETED timeline action qualify, so a concurrent writer's
  * not-yet-committed base can never be deleted. Snapshot reads at the
  * tip are IDENTICAL before and after; time travel older than the
  * retained window stops working (the same contract as Delta VACUUM).
  * The service lands as a `<instant>.clean` timeline marker — clean
  * instants never become read ceilings (ceilings parse only commit
  * actions). Driver state is the file LISTING (metadata scale, the
  * same grade as every Hudi table service); deletes are per-file
  * filesystem metadata calls. Returns the number of files deleted. */
object HudiClean {

  /** KEEP_LATEST_COMMITS — Hudi's DEFAULT policy, windowed by the
    * TIMELINE instead of per-group version count: every snapshot within
    * the last `retainCommits` completed commits stays fully readable
    * (time travel, pinned incremental ceilings), which means each group
    * keeps all slices newer than the window floor PLUS the one slice
    * visible AT the floor; only slices superseded before the window
    * opened are deleted. The right policy when incremental consumers
    * may lag up to N commits. Same horizon marker / inflight safety /
    * replaced-group handling as [[clean]]. */
  def cleanByCommits(spark: SparkSession, table: String, instant: String,
                     retainCommits: Int, maxFiles: Int = 1000000): Int = {
    require(retainCommits >= 1, "retainCommits must be >= 1")
    val completed = HudiRead.completedInstants(spark, table)
    if (completed.size <= retainCommits) return 0
    // the window floor: the oldest commit whose snapshot must stay
    // readable
    val floor = completed.sortBy(HudiRead.instantKey)
      .takeRight(retainCommits).head
    cleanCore(spark, table, instant, maxFiles) { completedBases =>
      // keep slices newer than the floor + the slice visible AT it
      val floorKey = HudiRead.instantKey(floor)
      val idx = completedBases.indexWhere(b =>
        HudiRead.instantKey(b.instant) <= floorKey) // newest ≤ floor
      if (idx < 0) completedBases.size else idx + 1
    }
  }

  def clean(spark: SparkSession, table: String, instant: String,
            retainVersions: Int = 1, maxFiles: Int = 1000000): Int = {
    require(retainVersions >= 1, "retainVersions must be >= 1")
    cleanCore(spark, table, instant, maxFiles)(_ => retainVersions)
  }

  /** Shared sweep: `retainOf(completedBasesNewestFirst)` returns how
    * many newest slices of the group to keep. */
  private def cleanCore(spark: SparkSession, table: String, instant: String,
                        maxFiles: Int)
                       (retainOf: Seq[HudiRead.BaseFile] => Int): Int = {
    require(instant.nonEmpty && instant.forall(_.isDigit),
      s"instant must be a numeric timeline string, got '$instant'")
    val completed = HudiRead.completedInstants(spark, table)
    if (completed.isEmpty) return 0
    val tip = completed.maxBy(HudiRead.instantKey)
    val completedSet = completed.toSet
    val (bases, logs) = HudiRead.allDataFiles(spark, table, maxFiles)
    val replaced = HudiRead.replacedFileIds(spark, table, tip)
    val logsByGroup = logs.groupBy(l => (l.partition, l.fileId))
    val toDelete = scala.collection.mutable.ArrayBuffer.empty[String]
    // CLEAN HORIZON per group: after deleting a group's old slices, any
    // read ceiling BELOW the oldest retained slice's instant (below the
    // tip, for replaced groups) would select a deleted file and
    // silently shrink — the max over groups is recorded in the marker
    // and gates time travel / pinned incremental ceilings loudly
    // ([[HudiRead.cleanHorizon]]).
    val safeCeilings = scala.collection.mutable.ArrayBuffer.empty[String]
    bases.groupBy(b => (b.partition, b.fileId)).foreach { case (key, files) =>
      val groupLogs = logsByGroup.getOrElse(key, Nil)
      if (replaced.contains(key)) {
        // the whole group is invisible at the tip: every completed file goes
        val doomed = files.filter(b => completedSet.contains(b.instant))
          .map(_.path) ++ groupLogs
          .filter(l => completedSet.contains(l.baseInstant)).map(_.path)
        if (doomed.nonEmpty) safeCeilings += tip
        toDelete ++= doomed
      } else {
        val completedBases = files
          .filter(b => completedSet.contains(b.instant))
          .sortBy(b => HudiRead.instantKey(b.instant)).reverse
        val retain = retainOf(completedBases)
        val doomedBases = completedBases.drop(retain)
        toDelete ++= doomedBases.map(_.path)
        // logs folded under the oldest RETAINED base are obsolete
        val doomedLogs = completedBases.take(retain).lastOption
          .toSeq.flatMap { oldest =>
            val floor = HudiRead.instantKey(oldest.instant)
            groupLogs.filter(l =>
              HudiRead.instantKey(l.baseInstant) < floor &&
                completedSet.contains(l.baseInstant)).map(_.path)
          }
        toDelete ++= doomedLogs
        if (doomedBases.nonEmpty || doomedLogs.nonEmpty)
          completedBases.take(retain).lastOption.foreach(b =>
            safeCeilings += b.instant)
      }
    }
    // RECONCILE prior cleans first: a crash mid-delete leaves files that
    // earlier markers already SUBTRACTED from the metadata file view —
    // this sweep's own toDelete derives from that view, so it can never
    // see them, and without the re-attempt they leak forever.
    val reconciled = reconcilePriorMarkers(spark, table)
    if (toDelete.isEmpty) return reconciled
    val conf = spark.sparkContext.hadoopConfiguration
    val horizon = safeCeilings.maxByOption(HudiRead.instantKey)
    // the marker records WHICH table-relative paths this clean deletes,
    // so the listing-free reader ([[HudiRead.filesFromCommitMetadata]])
    // can SUBTRACT them from the commit-named file set instead of
    // falling back to directory listings forever after the first clean —
    // the same role Hudi's metadata table plays for its cleaner. Bounded
    // by deleted-file count (a maintenance batch, the clean's own unit).
    // Written BEFORE the deletes: a crash mid-clean then leaves on-disk
    // files the marker already subtracted from the view (instead of
    // pointing reads at missing files); [[reconcilePriorMarkers]] on the
    // NEXT clean re-attempts exactly those deletions, so the leak is
    // one-clean-bounded, never permanent.
    val tableUri = new Path(table).toUri.getPath.stripSuffix("/")
    def relOf(abs: String): String = {
      val p = new Path(abs).toUri.getPath
      p.stripPrefix(tableUri).stripPrefix("/")
    }
    def js(s: String) =
      graft.sources.DocPushdown.jsonMapper.writeValueAsString(s)
    val marker = new Path(new Path(table, ".hoodie"), s"$instant.clean")
    val f = marker.getFileSystem(conf)
    val out = f.create(marker, true)
    try out.write(
      (s"""{"minSafeCeiling":${horizon.map(h => s""""$h"""").getOrElse("null")},""" +
        s""""deletedPaths":${toDelete.map(p => js(relOf(p))).mkString("[", ",", "]")}}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    toDelete.foreach { p =>
      val path = new Path(p)
      path.getFileSystem(conf).delete(path, false): Unit
    }
    toDelete.size + reconciled
  }

  /** Re-attempt deletion of paths PRIOR clean markers named but a crash
    * left on disk. Those paths are already subtracted from the metadata
    * file view ([[HudiRead.filesFromCommitMetadata]]) — invisible to
    * every metadata-driven reader, so deleting them is always safe, and
    * no later sweep derived from that view could ever find them again.
    * Executor-parallel existence checks + deletes (the [[graft.sources
    * .BucketedLake.footerSweep]] pattern) — bounded by the total
    * previously-cleaned path count, never a driver loop of remote
    * calls. Returns files actually reclaimed (normally 0). */
  private def reconcilePriorMarkers(spark: SparkSession,
                                    table: String): Int = {
    val dir = new Path(table, ".hoodie")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return 0
    val names = fs.listStatus(dir).iterator.filterNot(_.isDirectory)
      .map(_.getPath.getName).toSet
    // MIGRATE legacy `<instant>.cleanack` sidecars (a two-dot-part name
    // the timeline parser misread as a phantom completed instant) to the
    // three-part `<instant>.clean.reconciled` shape — the verification
    // they recorded carries over, and the phantom row disappears
    names.filter(_.endsWith(".cleanack")).foreach { legacy =>
      val out = fs.create(
        new Path(dir, legacy.stripSuffix("ack") + ".reconciled"), true)
      try out.write("{}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(new Path(dir, legacy), false): Unit
    }
    // each marker is verified ONCE: a confirmed-reconciled marker gets a
    // `<instant>.clean.reconciled` sibling, so this pass is bounded by
    // cleans since the last reconcile, not by everything ever deleted
    val pending = names.filter(_.endsWith(".clean"))
      .filter(n => !names.contains(n + ".reconciled") &&
        !names.contains(n + "ack")).toSeq.sorted
    if (pending.isEmpty) return 0
    val pairs: Seq[(String, String)] = pending.flatMap { n =>
      val in = fs.open(new Path(dir, n))
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      Option(graft.sources.DocPushdown.jsonMapper.readTree(json)
        .get("deletedPaths")).filterNot(_.isNull).toSeq.flatMap { arr =>
        import scala.jdk.CollectionConverters._
        arr.elements().asScala.map(rel => (n, rel.asText())).toSeq
      }
    }
    val (reclaimed, failedMarkers) =
      if (pairs.isEmpty) (0, Set.empty[String])
      else {
        import scala.jdk.CollectionConverters._
        val props = spark.sparkContext.broadcast(
          spark.sparkContext.hadoopConfiguration.iterator().asScala
            .map(e => (e.getKey, e.getValue)).toArray)
        val root = table
        val res = spark.sparkContext
          .parallelize(pairs, math.min(pairs.size,
            spark.sparkContext.defaultParallelism * 2))
          .map { case (marker, rel) =>
            val conf = new org.apache.hadoop.conf.Configuration(false)
            props.value.foreach { case (k, v) => conf.set(k, v) }
            val p = new Path(new Path(root), rel)
            val f = p.getFileSystem(conf)
            if (!f.exists(p)) (marker, 0, false)
            else if (f.delete(p, false)) (marker, 1, false)
            else (marker, 0, true) // delete failed: do NOT ack the marker
          }.collect() // bounded by pending markers' path counts
        (res.map(_._2).sum, res.filter(_._3).map(_._1).toSet)
      }
    // ack every fully-verified marker (including path-less foreign ones
    // — nothing more can ever be done for them). The sidecar is
    // `<instant>.clean.reconciled`: THREE dot-parts, so the timeline
    // parser's `<ts>.<action>` completed-instant branch never sees it
    // as a phantom instant
    pending.filterNot(failedMarkers.contains).foreach { n =>
      val out = fs.create(new Path(dir, n + ".reconciled"), true)
      try out.write("{}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    reclaimed
  }
}
