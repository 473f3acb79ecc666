package graft.apps

import org.apache.spark.sql.types.StructType

import graft.core.SparkEnv
import graft.sink.LakeTable
import graft.streaming.LakeMirror

/** CLI for continuous lake-to-lake replication — tail a Delta / Iceberg
  * / Hudi table's change feed and mirror it, exactly-once, into any
  * writable target: the graft lake (default), a REAL Delta table
  * (`--target-format delta`: keyed MERGE commits with cdc emission,
  * SetTransaction idempotence), a REAL Iceberg table
  * (`--target-format iceberg`: equality-delete upserts, snapshot-id
  * idempotence) or a REAL Hudi COW table (`--target-format hudi`:
  * group-scoped rewrites, timeline-instant idempotence) — any→any
  * across all four layouts:
  *
  * {{{
  * sbt 'runMain graft.apps.LakeMirrorApp
  *   --format delta --source /lake/src --target /lake/replica
  *   --checkpoint /lake/replica_ckpt
  *   --schema "id LONG, item STRING" --record-key id
  *   [--target-format graft|iceberg|hudi]
  *   [--partition-field col]             # hudi target: hive-style routing
  *   [--available-now]                   # drain backlog, then exit
  *   [--trigger-time 60]                 # else: follow continuously
  *   [--max-files-per-trigger 1000]      # admission control
  *   [--starting-version N | --starting-snapshot-id N | --starting-instant T]
  * }}}
  *
  * The graft-lake replica's precombine is the source commit VERSION
  * (last writer wins across replayed batches). `--available-now` is
  * the backfill shape: the tip is pinned at start, the history drains
  * in `maxFilesPerTrigger`-bounded batches, and the app exits. */
object LakeMirrorApp {

  /** The full flag vocabulary — a typo'd `--flag` is REJECTED with the
    * known set instead of silently ignored (a silently-dropped
    * `--starting-version` would replay the whole history). */
  private val ValueFlags = Seq("format", "source", "target", "checkpoint",
    "schema", "record-key", "target-format", "trigger-time",
    "max-files-per-trigger", "starting-version", "starting-snapshot-id",
    "starting-instant", "partition-field")

  def main(args: Array[String]): Unit = {
    var cli = Map.empty[String, String]
    var availableNow = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--available-now" => availableNow = true
        case flag if flag.startsWith("--") =>
          val name = flag.stripPrefix("--")
          if (!ValueFlags.contains(name)) throw new IllegalArgumentException(
            s"unknown option --$name (known: --available-now, " +
              ValueFlags.map("--" + _).mkString(", ") + ")")
          if (i + 1 >= args.length) throw new IllegalArgumentException(
            s"option --$name needs a value")
          cli += name -> args(i + 1); i += 1
        case other =>
          throw new IllegalArgumentException(s"unrecognized argument: $other")
      }
      i += 1
    }
    Seq("format", "source", "target", "checkpoint", "schema", "record-key")
      .foreach(k => require(cli.contains(k), s"Missing argument : (--$k)"))
    val format = cli("format")
    val lake = LakeTable(
      path = cli("target"),
      tableName = s"mirror_${new java.io.File(cli("source")).getName}",
      recordKeyFields = cli("record-key").split(",").map(_.trim).toSeq,
      precombineField = "version")
    val rowSchema = StructType.fromDDL(cli("schema"))
    val startingOpts = Seq(
      "starting-version" -> "startingVersion",
      "starting-snapshot-id" -> "startingSnapshotId",
      "starting-instant" -> "startingInstant",
      "max-files-per-trigger" -> "maxFilesPerTrigger").flatMap {
      case (flag, opt) => cli.get(flag).map(opt -> _)
    }.toMap
    val spark = SparkEnv.appBuilder(s"graft-lake-mirror-$format").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targetFormat = cli.getOrElse("target-format", "graft")
    val q = targetFormat match {
      case "graft" =>
        LakeMirror.start(spark, format, cli("source"), lake, rowSchema,
          cli("checkpoint"), startingOpts, availableNow,
          triggerSeconds = cli.getOrElse("trigger-time", "60").toInt)
      case "iceberg" | "hudi" | "delta" =>
        val keys = lake.recordKeyFields
        val fields = rowSchema.fields.zipWithIndex.map { case (f, i) =>
          (i + 1, f.name, f.dataType match {
            case org.apache.spark.sql.types.LongType => "long"
            case org.apache.spark.sql.types.IntegerType => "int"
            case org.apache.spark.sql.types.StringType => "string"
            case org.apache.spark.sql.types.DoubleType => "double"
            case other => throw new IllegalArgumentException(
              s"--target-format $targetFormat: no mapping for column " +
                s"${f.name} of type $other")
          })
        }.toSeq
        val stream = spark.readStream.format(s"graft-$format")
          .option("path", cli("source")).options(startingOpts).load()
        stream.writeStream
          .option("checkpointLocation", cli("checkpoint"))
          .trigger(
            if (availableNow) org.apache.spark.sql.streaming.Trigger.AvailableNow()
            else org.apache.spark.sql.streaming.Trigger.ProcessingTime(
              s"${cli.getOrElse("trigger-time", "60")} seconds"))
          .foreachBatch {
            (b: org.apache.spark.sql.DataFrame, epoch: Long) =>
              // the checkpoint path IS the stream identity: commit ids
              // derive from it, so two streams into one target cannot
              // collide and a reset checkpoint fails loudly
              if (targetFormat == "iceberg")
                LakeMirror.applyBatchIceberg(spark, b, cli("target"), keys,
                  fields, rowSchema, epoch, streamId = cli("checkpoint"))
              else if (targetFormat == "delta")
                LakeMirror.applyBatchDelta(spark, b, cli("target"), keys,
                  rowSchema, epoch, streamId = cli("checkpoint"))
              else {
                require(keys.size == 1,
                  "--target-format hudi mirrors by exactly one key column")
                LakeMirror.applyBatchHudi(spark, b, cli("target"), keys.head,
                  rowSchema, epoch, streamId = cli("checkpoint"),
                  partitionField = cli.get("partition-field"))
              }
          }
          .start()
      case other => throw new IllegalArgumentException(
        s"unknown --target-format '$other' (graft|delta|iceberg|hudi)")
    }
    q.awaitTermination()
  }
}
