package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * lake as opaque `binary` columns with a typed metadata struct alongside.
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED — the image/audio libraries are not in this container — behind
  * [[DecodeStub]], a deterministic fake that derives "features" from the
  * bytes. Everything Spark-side is real and tested: schema contract, batch
  * shape (partition-wise iteration, one codec init per partition — the same
  * shape a Python `mapInPandas`/Arrow-batch UDF has), partitioning, and the
  * pruned-scan friendliness of keeping metadata in top-level columns while
  * the blob stays untouched until the last stage.
  */
object Multimodal {

  /** media metadata contract: what a real decoder would emit. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Wrap a text/bytes column as a media payload column (UTF-8 bytes stand in
    * for an encoded image). Pure expression — no data movement. */
  def asMedia(df: DataFrame, srcCol: String, mediaCol: String = "media"): DataFrame =
    df.withColumn(mediaCol, to_binary(col(srcCol), lit("utf-8")))

  /** Expression-level metadata extraction: cheap, codegen'd, and enough for
    * partition pruning / filtering WITHOUT touching a decoder. Fake
    * width/height are derived deterministically from the checksum. */
  def extractMeta(df: DataFrame, mediaCol: String = "media",
                  metaCol: String = "meta"): DataFrame =
    df.withColumn(metaCol, struct(
      length(col(mediaCol)).cast("long").as("n_bytes"),
      lit("image/fake").as("media_type"),
      (pmod(xxhash64(col(mediaCol)), lit(1024)) + 32).cast("int").as("width"),
      (pmod(xxhash64(col(mediaCol), lit(1)), lit(1024)) + 32).cast("int").as("height"),
      md5(col(mediaCol)).as("checksum")))

  /** The stubbed codec. A real implementation would JNI/handoff to an image
    * library here; the contract (bytes in, fixed-length feature vector out,
    * one expensive init per partition) is what the pipeline depends on. */
  object DecodeStub {
    val FeatureDim = 8

    /** Deterministic fake "embedding": rolling byte statistics. Marks the
      * seam where a real decoder goes (???-equivalent, see class doc). */
    def features(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        out(i % FeatureDim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Partition-wise batch "decode": the Scala analog of a Pandas
    * `mapInPandas` UDF — per-partition codec init, streamed row batches,
    * appended feature column. RDD boundary is deliberate and isolated here;
    * every other op in this file stays in Catalyst. */
  def decodeFeatures(df: DataFrame, mediaCol: String = "media",
                     outCol: String = "features"): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition init of the (stub) codec happens here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val feats = if (bytes == null) null else DecodeStub.features(bytes)
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
