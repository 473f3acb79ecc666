package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S12 — CDC stream sources with the binlog event shape and resumable
  * offsets. Real MySQL binlog tailing is out of scope (zero-egress harness;
  * SURVEY.md §7.3) — these sources produce the SAME unbounded DataFrame
  * contract ([[CdcSchema.EventSchema]]), so the demux sink and its
  * semantics are exercised end to end:
  *
  *  - [[fileStream]]: JSON-lines directory tail (the standard replayable
  *    test/staging transport; offsets = file names, checkpoint-resumable);
  *  - [[rateStream]]: synthetic generator on the rate source for soak/bench.
  *
  * A Kafka-backed variant is the production path (`format("kafka")` with the
  * same `select(from_json(...))` projection) — identical downstream code. */
object CdcSource {

  /** Tail a directory of JSON-lines CDC event files. `maxFilesPerTrigger`
    * bounds micro-batch size (backpressure). */
  def fileStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(CdcSchema.EventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Synthetic CDC generator: `rowsPerSecond` change events across
    * `numTables` tables (db "db0", tables "t0".."tN"), payload
    * `{id, v, ver}` keyed so updates collide with earlier inserts. */
  def rateStream(spark: SparkSession, rowsPerSecond: Int = 100,
                 numTables: Int = 2, keySpace: Long = 1000): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        lit("db0").as("db"),
        concat(lit("t"), (col("value") % numTables).cast("string")).as("table"),
        when(col("value") % 10 === 9, CdcSchema.OpDelete)
          .otherwise(CdcSchema.OpUpdate).as("op"),
        (col("timestamp").cast("double") * 1000).cast("long").as("ts_ms"),
        col("value").as("offset"),
        to_json(struct(
          (col("value") % keySpace).as("id"),
          concat(lit("v"), col("value").cast("string")).as("v"),
          col("value").as("ver"))).as("payload"))
}
