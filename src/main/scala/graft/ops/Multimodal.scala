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

    /** Deterministic fake resize: nearest-neighbor sample of the byte
      * sequence to `w * h` output bytes (the real decoder/resampler seam). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes.isEmpty) return bytes
      val out = new Array[Byte](w * h)
      var k = 0
      while (k < out.length) {
        out(k) = bytes((k.toLong * bytes.length / out.length).toInt)
        k += 1
      }
      out
    }
  }

  /** Frame sampling (video analog): `n` evenly-spaced byte slices of the
    * payload stand in for decoded frames, exploded one row per frame with
    * its index. PURE Catalyst — binary `substr` + `posexplode`, codegen'd,
    * no RDD boundary — because slicing is the part a real pipeline can do
    * before any codec runs (container formats index frames by offset).
    * Payloads shorter than `n` bytes yield fewer (non-empty) frames. */
  def frameSample(df: DataFrame, n: Int, mediaCol: String = "media",
                  frameCol: String = "frame"): DataFrame = {
    require(n > 0, "need at least one frame")
    // floor: Column./ is double division, which would drift frame offsets
    val width = greatest(lit(1L), floor(length(col(mediaCol)).cast("long") / n).cast("long"))
    val slices = array((0 until n).map(i =>
      col(mediaCol).substr((lit(i.toLong) * width + 1).cast("int"), width.cast("int"))): _*)
    df.select(col("*"), posexplode(slices).as(Seq("frame_idx", frameCol)))
      .filter(length(col(frameCol)) > 0)
  }

  /** Partition-wise "resize": same seam as [[decodeFeatures]] — a real
    * implementation decodes, resamples to `w` x `h`, re-encodes; the stub
    * nearest-neighbor-samples the byte sequence to the target pixel count,
    * deterministically. Metadata must be re-extracted afterwards. */
  def resizeMedia(df: DataFrame, w: Int, h: Int,
                  mediaCol: String = "media"): DataFrame = {
    require(w > 0 && h > 0, "target dims must be positive")
    val schema = df.schema
    val mediaIdx = schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition init of the (stub) codec happens here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val out = if (bytes == null) null else DecodeStub.resize(bytes, w, h)
        Row.fromSeq(r.toSeq.updated(mediaIdx, out))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
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
