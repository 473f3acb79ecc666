package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.IcebergRead

/** SNAPSHOT EXPIRATION table service for Iceberg — `expire_snapshots`,
  * the maintenance operation that bounds metadata growth and reclaims
  * space: drop all but the newest `retain` snapshots from the metadata
  * (new `vN.metadata.json` + `version-hint.text` bump — old metadata
  * versions stay, matching Iceberg), then delete every file reachable
  * ONLY from the expired snapshots: their manifest lists, orphaned
  * manifests, and orphaned data/delete files.
  *
  * Reachability is computed conservatively: a file mentioned by ANY
  * kept snapshot's manifests (any entry status — even DELETED entries,
  * whose files may still serve earlier kept snapshots) survives; only
  * files under the TABLE LOCATION are ever deleted (absolute locations
  * elsewhere are not ours to reap). Manifest parsing reuses the
  * executor-parallel path, so the expired-reachability sweep is bounded
  * by manifests/parallelism like every other planning walk.
  *
  * Returns (expired snapshot count, deleted file count). */
object IcebergExpire {

  def expireSnapshots(spark: SparkSession, table: String,
                      retain: Int): (Int, Int) = {
    require(retain >= 1, "retain must be >= 1")
    val meta = IcebergRead.readMetadata(spark, table)
    import scala.jdk.CollectionConverters._
    val snaps = Option(meta.get("snapshots")).toSeq
      .flatMap(_.elements().asScala).toSeq
    if (snaps.size <= retain) return (0, 0)
    // ref-pinned snapshots (tags/branches) are RETAINED regardless of
    // their age — a tag means "keep this state addressable"
    val pinned = IcebergRead.refSnapshotIds(meta).values.toSet
    val (expired, kept) = {
      val (old, recent) = snaps.splitAt(snaps.size - retain)
      val (oldPinned, oldExpired) =
        old.partition(s => pinned.contains(s.get("snapshot-id").asLong()))
      (oldExpired, oldPinned ++ recent)
    }
    if (expired.isEmpty) return (0, 0)
    val current = Option(meta.get("current-snapshot-id")).map(_.asLong())
    require(current.forall(c =>
        kept.exists(_.get("snapshot-id").asLong() == c)),
      "refusing to expire the CURRENT snapshot — lower retain only " +
        "after committing newer snapshots")

    def manifestsOf(snapNodes: Seq[com.fasterxml.jackson.databind.JsonNode])
        : Map[String, Seq[String]] =
      snapNodes.map { s =>
        val list = s.get("manifest-list").asText()
        list -> IcebergRead.avroRecords(spark, list)
          .map(_.get("manifest_path").toString)
      }.toMap
    val keptLists = manifestsOf(kept)
    val expiredLists = manifestsOf(expired)
    val keptManifests = keptLists.values.flatten.toSet
    val expiredOnlyManifests =
      expiredLists.values.flatten.toSet -- keptManifests

    // file paths reachable from kept snapshots (ANY status — conservative)
    val keptFiles = IcebergRead
      .parseManifests(spark, keptManifests.toSeq)
      .values.flatten.map(_.path).toSet
    val expiredFiles = IcebergRead
      .parseManifests(spark, expiredOnlyManifests.toSeq)
      .values.flatten.map(_.path).toSet
    val orphanedData = expiredFiles -- keptFiles

    // rewrite the metadata with only the kept snapshots
    val mapper = graft.sources.DocPushdown.jsonMapper
    val node = meta.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val arr = mapper.createArrayNode()
    kept.foreach(s => arr.add(s): Unit)
    node.set[com.fasterxml.jackson.databind.JsonNode]("snapshots", arr)
    val metaDir = new Path(table, "metadata")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hint = new Path(metaDir, "version-hint.text")
    val v = {
      val in = fs.open(hint)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
    def write(p: Path, s: String): Unit = {
      val out = fs.create(p, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    write(new Path(metaDir, s"v${v + 1}.metadata.json"),
      mapper.writeValueAsString(node))
    write(hint, (v + 1).toString)

    // reap: expired manifest lists, orphaned manifests, orphaned files —
    // only under the table location
    val tableRoot = fs.makeQualified(new Path(table)).toString
    def underTable(p: String): Boolean =
      fs.makeQualified(new Path(p)).toString.startsWith(tableRoot + "/")
    var deleted = 0
    (expiredLists.keySet ++ expiredOnlyManifests ++ orphanedData).foreach { p =>
      if (underTable(p) && fs.delete(new Path(p), false)) deleted += 1
    }
    (expired.size, deleted)
  }
}
