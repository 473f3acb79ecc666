package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite
import graft.sink.{LakeTable, MergeWriter}

/** The full ingest path in ONE spec — KafkaStreamSource →
  * [[MultiTableSink]] (bronze: raw keyed landing) and KafkaStreamSource →
  * [[CurationStream]] (silver: dedup + upsert) — with a kill/restart in
  * the middle of the stream. The three components are specced pairwise
  * elsewhere; this is the composition a real pipeline runs, and the
  * crash window is where exactly-once claims go to die:
  *
  *  - the bronze leg must land every distinct doc key exactly once even
  *    when the producer re-publishes (at-least-once upstream) and the
  *    query is killed and resumed from its checkpoint;
  *  - the silver leg must keep exactly one doc per distinct TEXT across
  *    batches, restarts, and replayed micro-batches. */
class KafkaCurationLakeSpec extends SparkSuite {

  import spark.implicits._

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)
  private def doc(id: Long, text: String): (Array[Byte], Array[Byte], Long) =
    (b(id.toString), b(s"""{"doc_id":$id,"text":"$text"}"""), 1000L + id)

  private def kafkaDf(broker: KafkaLoopback): DataFrame =
    spark.readStream.format("graft-kafka")
      .option("bootstrap", broker.bootstrap)
      .option("topic", "docs")
      .load()

  test("kafka → bronze demux + silver curation survive a kill/restart " +
       "with exactly-once lake contents") {
    val broker = new KafkaLoopback(numPartitions = 2)
    val root = Files.createTempDirectory("graft-e2e-lake").toString
    val bronzeCkpt = Files.createTempDirectory("graft-e2e-bronze-ckpt").toString
    val silverCkpt = Files.createTempDirectory("graft-e2e-silver-ckpt").toString
    val silverTable = LakeTable(
      path = s"$root/silver/corpus", tableName = "corpus",
      recordKeyFields = Seq("doc_id"), precombineField = "doc_id")
    val bronzeSink = new MultiTableSink(s"$root/bronze/{db}/ods_{db}_{table}",
      Seq(CdcTableSpec("corpus", "docs",
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))),
        Seq("doc_id"), "doc_id")), 1)

    def runBoth(): Unit = {
      // bronze: raw CDC-shaped landing (offset made globally unique across
      // kafka partitions for the last-writer-wins precombine)
      val events = kafkaDf(broker).select(
        lit("corpus").as("db"), lit("docs").as("table"),
        lit("insert").as("op"), col("timestamp").as("ts_ms"),
        (col("partition").cast("long") * 1000000L + col("offset")).as("offset"),
        col("value").cast("string").as("payload"))
      val qBronze = bronzeSink.start(events, bronzeCkpt)
      // silver: parse → dedup-ingest
      val docs = kafkaDf(broker)
        .selectExpr("from_json(cast(value as string), 'doc_id BIGINT, text STRING') j")
        .select(col("j.doc_id").as("doc_id"), col("j.text").as("text"))
      val qSilver = CurationStream.start(docs, silverTable, silverCkpt,
        triggerMs = 100L)
      try { qBronze.processAllAvailable(); qSilver.processAllAvailable() }
      finally { qBronze.stop(); qSilver.stop() }
    }

    try {
      broker.createTopic("docs")
      // phase 1: d3 is a TEXT dup of d1 (different key, same content),
      // spread across both kafka partitions
      broker.append("docs", 0, Seq(doc(1L, "alpha text"), doc(2L, "beta text")))
      broker.append("docs", 1, Seq(doc(3L, "alpha text")))
      runBoth()
      // ---- the crash: both queries are dead; new query objects resume
      // from the same checkpoints after MORE data arrived ----
      broker.append("docs", 0, Seq(
        doc(4L, "gamma text"),
        doc(2L, "beta text"))) // producer re-publish (at-least-once upstream)
      broker.append("docs", 1, Seq(doc(5L, "beta text"))) // text dup of d2
      runBoth()

      // bronze: every distinct key exactly once (re-publish collapsed by
      // the keyed upsert), nothing lost, nothing doubled across restart
      val bronze = spark.read
        .parquet(s"$root/bronze/corpus/ods_corpus_docs/data")
        .select("doc_id").as[Long].collect().toSeq
      assert(bronze.sorted === Seq(1L, 2L, 3L, 4L, 5L),
        s"bronze lost or doubled rows: $bronze")

      // silver: one doc per distinct text — d3/d5 text-dups dropped, the
      // d2 re-publish classified as corpus dup
      val silver = MergeWriter.readView(spark, silverTable)
        .select("doc_id", "text").as[(Long, String)].collect().toSeq
      assert(silver.sortBy(_._1) === Seq((1L, "alpha text"),
        (2L, "beta text"), (4L, "gamma text")),
        s"silver dedup broke across the restart: $silver")

      // replayed micro-batch (crash AFTER upsert, BEFORE checkpoint
      // commit): re-ingesting phase-1 docs must change nothing
      CurationStream.ingestBatch(
        Seq((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text"))
          .toDF("doc_id", "text"), silverTable)
      val replayed = MergeWriter.readView(spark, silverTable)
        .select("doc_id").as[Long].collect().toSeq
      assert(replayed.sorted === Seq(1L, 2L, 4L),
        "a replayed micro-batch mutated the silver table")
    } finally broker.close()
  }
}
