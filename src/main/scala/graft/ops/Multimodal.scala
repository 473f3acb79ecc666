package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * lake as opaque `binary` columns with a typed metadata struct alongside.
  *
  * Image decode/resize/feature-extraction is REAL: [[ImageIoCodec]] drives
  * `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP, JDK-only). WAV audio decode is
  * REAL too: [[WavCodec]] drives `javax.sound.sampled` (RIFF/PCM, JDK-only,
  * headless-safe), and COMPRESSED audio has a real from-scratch leg:
  * [[FlacCodec]] (frames, fixed/LPC predictors, Rice residuals, CRCs — the
  * JDK ships no FLAC reader). Payloads none of these accept — video
  * codecs, lossy audio — fall back to [[DecodeStub]], a deterministic fake
  * that derives "features" from the raw bytes (the remaining documented
  * codec seam). Everything Spark-side is real and
  * tested: schema contract, batch shape (partition-wise iteration, one
  * codec init per partition — the same shape a Python `mapInPandas`/
  * Arrow-batch UDF has), partitioning, and the pruned-scan friendliness of
  * keeping metadata in top-level columns while the blob stays untouched
  * until the last stage.
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

  /** Real JDK-only image codec: `javax.imageio` decodes PNG/JPEG/BMP/GIF/
    * WBMP with zero dependencies. Undecodable payloads (video containers,
    * audio, arbitrary bytes) fall through to [[DecodeStub]] — the remaining
    * documented stub seam. */
  object ImageIoCodec {
    /** Exact integer pixel statistics of a decoded image — integer-exact
      * so results hash-match across engines (no float accumulation). */
    final case class ImageStats(width: Int, height: Int, channels: Int,
                                sumR: Long, sumG: Long, sumB: Long)

    // ---- decode/access hot path -------------------------------------
    // `ImageIO.read` scans the service registry per call and
    // `BufferedImage.getRGB` routes every pixel through ColorModel
    // virtual dispatch; across the media query family those two costs
    // dominated the bench (guide §1.2 step 2: per-task work). The fast
    // paths below are exact-identical to the originals:
    //  - readers/writers are cached per thread and selected by the same
    //    container magic the registry would sniff (PNG/GIF only; every
    //    other payload still walks the registry), decoding via the same
    //    reader class with the same (seekForwardOnly=true,
    //    ignoreMetadata=true) inputs `ImageIO.read` uses;
    //  - pixel access reads the backing raster ONLY for the standard
    //    layouts where `getRGB` is a pure repack (TYPE_3BYTE_BGR /
    //    TYPE_INT_RGB direct buffers, TYPE_BYTE_INDEXED through the
    //    palette's own getRGB LUT); anything else — notably
    //    TYPE_BYTE_GRAY, whose getRGB applies a linear-gray→sRGB color
    //    transform — falls back to the per-pixel getRGB loop.

    private val readerCache =
      new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
        override def initialValue() = new java.util.HashMap()
      }
    private[ops] def cachedReader(fmt: String): javax.imageio.ImageReader = {
      val m = readerCache.get
      var r = m.get(fmt)
      if (r == null) {
        r = javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next()
        m.put(fmt, r)
      }
      r
    }
    private val writerCache =
      new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageWriter]] {
        override def initialValue() = new java.util.HashMap()
      }
    private[ops] def cachedWriter(fmt: String): javax.imageio.ImageWriter = {
      val m = writerCache.get
      var w = m.get(fmt)
      if (w == null) {
        w = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
        m.put(fmt, w)
      }
      w
    }

    /** Container magic → ImageIO format name for the formats the fixture
      * pipelines mint; null = unknown (registry fallback). */
    private[ops] def sniffFormat(bytes: Array[Byte]): String = {
      if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G') "png"
      else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8') "gif"
      else null
    }

    /** Decode the first image of any ImageIO-readable payload — the
      * cached-reader twin of `ImageIO.read` (identical pixels; identical
      * reader selection for PNG/GIF, registry walk otherwise). */
    private[ops] def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      if (bytes == null || bytes.length == 0) return null
      val fmt = sniffFormat(bytes)
      if (fmt == null) {
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      } else {
        val reader = cachedReader(fmt)
        // direct in-memory stream: ImageIO.createImageInputStream consults
        // the (synchronized) stream-SPI registry AND — with the default
        // useCache=true — spools every payload to a TEMP FILE
        // (FileCacheImageInputStream); under a 32-thread decode stage the
        // temp-file churn serializes the whole family. Identical bytes,
        // identical decode.
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis, true, true) // what ImageIO.read passes
          reader.read(0)
        } catch { case _: Exception => null }
        finally { reader.setInput(null); iis.close() }
      }
    }

    /** The interleaved-byte BGR backing array when `getRGB` is a pure
      * repack of it (standard PNG-decode layout); null otherwise. */
    private def bgrData(img: java.awt.image.BufferedImage): Array[Byte] =
      img.getSampleModel match {
        case sm: java.awt.image.PixelInterleavedSampleModel
          if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
            sm.getPixelStride == 3 && sm.getScanlineStride == img.getWidth * 3 &&
            java.util.Arrays.equals(sm.getBandOffsets, Array(2, 1, 0)) &&
            img.getRaster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte] &&
            img.getRaster.getDataBuffer.getOffset == 0 =>
          img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
        case _ => null
      }

    /** The packed-int RGB backing array when `getRGB` is a pure repack. */
    private def intRgbData(img: java.awt.image.BufferedImage): Array[Int] =
      if ((img.getType == java.awt.image.BufferedImage.TYPE_INT_RGB ||
        img.getType == java.awt.image.BufferedImage.TYPE_INT_ARGB) &&
        img.getRaster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferInt] &&
        img.getRaster.getDataBuffer.getOffset == 0 &&
        img.getSampleModel.asInstanceOf[java.awt.image.SinglePixelPackedSampleModel]
          .getScanlineStride == img.getWidth)
        img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferInt].getData
      else null

    /** The single-band palette-index array + its getRGB LUT for indexed
      * images (standard GIF-decode layout); null otherwise. */
    private def indexedData(img: java.awt.image.BufferedImage): (Array[Byte], Array[Int]) =
      img.getColorModel match {
        case icm: java.awt.image.IndexColorModel
          if img.getType == java.awt.image.BufferedImage.TYPE_BYTE_INDEXED &&
            img.getRaster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte] &&
            img.getRaster.getDataBuffer.getOffset == 0 &&
            (img.getSampleModel match {
              case sm: java.awt.image.PixelInterleavedSampleModel =>
                sm.getPixelStride == 1 && sm.getScanlineStride == img.getWidth &&
                  java.util.Arrays.equals(sm.getBandOffsets, Array(0))
              case sm: java.awt.image.ComponentSampleModel =>
                sm.getPixelStride == 1 && sm.getScanlineStride == img.getWidth
              case _ => false
            }) =>
          val lut = new Array[Int](icm.getMapSize)
          icm.getRGBs(lut)
          (img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData, lut)
        case _ => null
      }

    /** Per-channel sums — bit-identical to the getRGB loop. */
    private[ops] def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      val bgr = bgrData(img)
      if (bgr != null) {
        var i = 0
        val n = w * h * 3
        while (i < n) {
          sb += bgr(i) & 0xFF; sg += bgr(i + 1) & 0xFF; sr += bgr(i + 2) & 0xFF
          i += 3
        }
        return (sr, sg, sb)
      }
      val ints = intRgbData(img)
      if (ints != null) {
        var i = 0
        val n = w * h
        while (i < n) {
          val rgb = ints(i)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          i += 1
        }
        return (sr, sg, sb)
      }
      val idx = indexedData(img)
      if (idx != null) {
        val (data, lut) = idx
        var i = 0
        val n = w * h
        while (i < n) {
          val rgb = lut(data(i) & 0xFF)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          i += 1
        }
        return (sr, sg, sb)
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          x += 1
        }
        y += 1
      }
      (sr, sg, sb)
    }

    /** One channel (16 = R, 8 = G, 0 = B) or the r+g+b sum (shift = -1)
      * as a row-major Int array — bit-identical to the getRGB loop. */
    private[ops] def channelArray(img: java.awt.image.BufferedImage,
                                  shift: Int): Array[Int] = {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Int](w * h)
      val bgr = bgrData(img)
      if (bgr != null) {
        var i = 0
        while (i < out.length) {
          out(i) =
            if (shift < 0) (bgr(3 * i) & 0xFF) + (bgr(3 * i + 1) & 0xFF) +
              (bgr(3 * i + 2) & 0xFF)
            else bgr(3 * i + shift / 8) & 0xFF // [b,g,r]: B@+0, G@+1, R@+2
          i += 1
        }
        return out
      }
      val ints = intRgbData(img)
      val idx = if (ints == null) indexedData(img) else null
      if (ints != null || idx != null) {
        var i = 0
        while (i < out.length) {
          val rgb = if (ints != null) ints(i) else idx._2(idx._1(i) & 0xFF)
          out(i) =
            if (shift < 0) ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            else (rgb >> shift) & 0xFF
          i += 1
        }
        return out
      }
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(y * w + x) =
            if (shift < 0) ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            else (rgb >> shift) & 0xFF
          x += 1
        }
        y += 1
      }
      out
    }

    /** Decode and fold per-channel sums in one raster pass; None when no
      * registered ImageIO reader accepts the bytes. */
    def decodeStats(bytes: Array[Byte]): Option[ImageStats] = {
      val img = decodeImage(bytes)
      if (img == null) None else Some(statsOf(img))
    }

    private[ops] def statsOf(img: java.awt.image.BufferedImage): ImageStats = {
      val (sr, sg, sb) = channelSums(img)
      val ch = if (img.getColorModel.hasAlpha) 4 else 3
      ImageStats(img.getWidth, img.getHeight, ch, sr, sg, sb)
    }

    /** Fixed 3×3 convolution bank over the REAL decoded R-channel
      * raster, abs nonlinearity, global sum pooling: Sobel-x, Sobel-y,
      * and Laplacian response energies — a deterministic, weights-free
      * embedding leg (gradient/structure signal a channel mean cannot
      * fake). INTEGER-exact so an arithmetic oracle replays it
      * bit-for-bit. None when the payload isn't a decodable image of at
      * least 3×3. */
    def convEnergies(bytes: Array[Byte]): Option[(Long, Long, Long)] =
      convEnergiesOf(decodeImage(bytes))

    private[ops] def convEnergiesOf(
        img: java.awt.image.BufferedImage): Option[(Long, Long, Long)] = {
      if (img == null || img.getWidth < 3 || img.getHeight < 3) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val r = channelArray(img, 16)
        var gxE = 0L; var gyE = 0L; var lapE = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            def v(dy: Int, dx: Int) = r((y + dy) * w + (x + dx))
            val gx = (v(-1, 1) + 2 * v(0, 1) + v(1, 1)) -
              (v(-1, -1) + 2 * v(0, -1) + v(1, -1))
            val gy = (v(1, -1) + 2 * v(1, 0) + v(1, 1)) -
              (v(-1, -1) + 2 * v(-1, 0) + v(-1, 1))
            val lap = 4 * v(0, 0) - v(0, -1) - v(0, 1) - v(-1, 0) - v(1, 0)
            gxE += math.abs(gx); gyE += math.abs(gy); lapE += math.abs(lap)
            x += 1
          }
          y += 1
        }
        Some((gxE, gyE, lapE))
      }
    }

    /** Feature vector ([[DecodeStub.FeatureDim]]-wide, same contract): for
      * decodable images [w, h, channels, meanR, meanG, meanB,
      * gradXEnergy/n, gradYEnergy/n] — ALL dims real decoded-pixel
      * statistics (the last two from [[convEnergies]]'s conv bank);
      * otherwise the stub's byte statistics (non-image payloads — the
      * remaining documented seam). */
    def features(bytes: Array[Byte]): Array[Float] = {
      val img = decodeImage(bytes) // ONE decode feeds stats + conv bank
      if (img == null) DecodeStub.features(bytes)
      else {
        val s = statsOf(img)
        val n = (s.width.toLong * s.height).toFloat
        val (gxE, gyE, _) = convEnergiesOf(img).getOrElse((0L, 0L, 0L))
        Array(s.width.toFloat, s.height.toFloat, s.channels.toFloat,
          s.sumR / n, s.sumG / n, s.sumB / n, gxE / n, gyE / n)
      }
    }

    /** Decode → area-scale → re-encode PNG; stub byte-resampling when the
      * payload isn't a decodable image. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = decodeImage(bytes)
      if (img == null) DecodeStub.resize(bytes, w, h)
      else {
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
        encodePng(dst)
      }
    }

    /** PNG-encode an RGB pixel function — the fixture-image minter used by
      * `media_features` and the specs (PNG is lossless, so a real decoder
      * must invert it exactly). */
    def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // TYPE_INT_RGB setRGB stores the low 24 bits verbatim — fill the
      // backing int buffer directly (identical pixels, no per-pixel
      // ColorModel dispatch)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { data(y * width + x) = rgb(x, y) & 0xFFFFFF; x += 1 }
        y += 1
      }
      encodePng(img)
    }

    private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      // same PNGImageWriter `ImageIO.write(img, "png", os)` resolves to,
      // minus the per-call registry scan
      val writer = cachedWriter("png")
      val bos = new java.io.ByteArrayOutputStream()
      // in-memory output stream — the registry path spools encodes through
      // a temp FILE by default (see decodeImage), a parallel-encode wall
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(img)
      } finally { writer.setOutput(null); ios.close() }
      bos.toByteArray
    }
  }

  /** Deterministic fixture-image pixel formula, shared verbatim with the
    * DuckDB oracle: channel c of pixel i (row-major) of doc `id` is
    * `((id % 100003) * 31 + i * 7 + c * 101) % 256`; dims are
    * `(8 + id % 9) x (8 + id % 7)`. */
  object FixtureImage {
    def dims(id: Long): (Int, Int) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
    def channel(id: Long, i: Long, c: Int): Int =
      (((id % 100003) * 31 + i * 7 + c * 101) % 256).toInt
    def png(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      ImageIoCodec.encodePng(w, h, (x, y) => {
        val i = y.toLong * w + x
        (channel(id, i, 0) << 16) | (channel(id, i, 1) << 8) | channel(id, i, 2)
      })
    }
  }

  /** Real JDK-only multi-frame codec: animated GIF via `javax.imageio`'s
    * sequence reader/writer — the closest a dependency-free JVM gets to a
    * genuine video container (indexed-palette frames, LZW-compressed,
    * LOSSLESS — so a real decoder must reproduce every frame's pixels
    * exactly). Frames are written full-size with an explicit 256-level
    * gray palette, so the encode→decode round trip preserves raw sample
    * values with no quantization. */
  object GifCodec {
    // lazy VAL, not def: the color model is immutable and was being
    // rebuilt (3x256-byte ramps + model) once per FRAME
    private lazy val grayPalette: java.awt.image.IndexColorModel = {
      val ramp = Array.tabulate[Byte](256)(i => i.toByte)
      new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    /** Encode full-size gray frames (row-major byte arrays) as one
      * animated GIF. */
    def encodeGif(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(frames.nonEmpty, "need at least one frame")
      val bos = new java.io.ByteArrayOutputStream()
      // in-memory output stream (no temp-file spool — see decodeImage)
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      // same GIFImageWriter the registry resolves, cached per thread
      val writer = ImageIoCodec.cachedWriter("gif")
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach { px =>
          val img = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
          // single-band byte raster: setSample(x, y, 0, v) is a plain
          // byte store — fill the backing array directly
          val data = img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData
          System.arraycopy(px, 0, data, 0, width * height)
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.setOutput(null); ios.close() }
      bos.toByteArray
    }

    final case class FrameStats(frameIdx: Int, width: Int, height: Int, graySum: Long)

    /** Typed decode outcome: a payload that is simply NOT a GIF (some other
      * format, or noise) is a different data-quality fact than a payload
      * that IS a recognized GIF but fails mid-decode (truncated LZW stream,
      * corrupt frame table). Pipelines count the two separately. */
    sealed trait DecodeResult
    case object NotAGif extends DecodeResult
    final case class DecodeError(message: String) extends DecodeResult
    final case class Decoded(frames: Seq[FrameStats]) extends DecodeResult

    /** Decode every frame of an animated GIF to exact integer gray sums,
      * classifying failures (see [[DecodeResult]]). */
    def decode(bytes: Array[Byte]): DecodeResult = {
      if (bytes == null || bytes.length == 0) return NotAGif
      // in-memory input stream (no temp-file spool — see decodeImage)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // the GIF magic lets the registry probe (and a throwaway reader per
      // payload) be skipped on the hot path; non-GIF-magic payloads still
      // walk the registry so the NotAGif classification is unchanged
      val sniffedGif = bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8'
      val (reader, ownReader) =
        if (sniffedGif) (ImageIoCodec.cachedReader("gif"), false)
        else {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); return NotAGif }
          (readers.next(), true)
        }
      try {
        if (reader.getFormatName.toLowerCase != "gif") return NotAGif
        reader.setInput(iis)
        // a recognized GIF that dies mid-read is CORRUPT, not non-GIF
        try {
          val n = reader.getNumImages(true)
          Decoded((0 until n).map { f =>
            val img = reader.read(f)
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L
            // getRGB & 0xFF = the palette entry's blue byte: bulk-read it
            // through the palette LUT for the standard indexed layout
            val fast = ImageIoCodec.channelArray(img, 0)
            var i = 0
            while (i < fast.length) { sum += fast(i); i += 1 }
            FrameStats(f, w, h, sum)
          })
        } catch {
          case e: Exception => DecodeError(
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
        }
      } finally {
        if (ownReader) reader.dispose() else reader.setInput(null)
        iis.close()
      }
    }

    /** Back-compat adapter: None for any non-decodable payload. */
    def decodeFrames(bytes: Array[Byte]): Option[Seq[FrameStats]] =
      decode(bytes) match {
        case Decoded(f) => Some(f)
        case _          => None
      }
  }

  /** Deterministic fixture-GIF formula, shared verbatim with the DuckDB
    * oracle: frame f, pixel i (row-major) of doc `id` is
    * `((id % 100003) * 37 + f * 11 + i * 13) % 256`; dims
    * `(6 + id % 5) x (5 + id % 4)`, `2 + id % 4` frames. */
  object FixtureGif {
    def dims(id: Long): (Int, Int) = ((6 + id % 5).toInt, (5 + id % 4).toInt)
    def nFrames(id: Long): Int = (2 + id % 4).toInt
    def pixel(id: Long, f: Int, i: Long): Int =
      (((id % 100003) * 37 + f * 11 + i * 13) % 256).toInt
    def gif(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val frames = (0 until nFrames(id)).map { f =>
        Array.tabulate[Byte](w * h)(i => pixel(id, f, i.toLong).toByte)
      }
      GifCodec.encodeGif(w, h, frames)
    }
  }

  /** Synthesize one fixture animated GIF per row from `idCol`
    * (partition-wise, same codec-init seam as [[synthesizeImages]]). */
  def synthesizeGifs(df: DataFrame, idCol: String = "doc_id",
                     mediaCol: String = "media"): DataFrame = {
    val schema = df.schema.add(StructField(mediaCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r => Row.fromSeq(r.toSeq :+ FixtureGif.gif(r.getLong(idIdx))) }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise REAL multi-frame decode: one output row per decoded
    * GIF frame with exact integer gray sums. Undecodable payloads emit a
    * single null-frame row so the one-row-per-doc-minimum contract holds;
    * `gif_verdict` distinguishes `ok` / `not_a_gif` / `decode_error: …`
    * (a truncated-but-recognized GIF is corrupt media, not a non-GIF —
    * data-quality pipelines count the two separately). */
  def gifFrameStats(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("frame_idx", IntegerType))
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("gray_sum", LongType))
      .add(StructField("gif_verdict", StringType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        GifCodec.decode(bytes) match {
          case GifCodec.Decoded(frames) => frames.iterator.map(s => Row.fromSeq(
            r.toSeq ++ Seq[Any](s.frameIdx, s.width, s.height, s.graySum, "ok")))
          case GifCodec.NotAGif => Iterator.single(
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, "not_a_gif")))
          case GifCodec.DecodeError(m) => Iterator.single(
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, s"decode_error: $m")))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Real JDK-only audio codec: `javax.sound.sampled.AudioSystem` parses
    * the RIFF/WAVE container and PCM format chunk with zero dependencies
    * (headless-safe — file parsing never touches an audio device). Covers
    * the WAV leg of the audio seam that [[DecodeStub]] previously faked;
    * compressed codecs (MP3/AAC/Opus) stay behind the stub, as the JDK
    * ships no decoder for them. */
  object WavCodec {
    /** Exact integer sample statistics of a decoded 16-bit PCM WAV —
      * integer-exact so results hash-match across engines. `zeroCross`
      * counts sign flips between consecutive samples (0 counts as
      * non-negative). */
    final case class AudioStats(sampleRate: Int, nSamples: Long, sumAbs: Long,
                                peak: Int, zeroCross: Long)

    /** The AudioFileReader SPI list, fetched ONCE:
      * `AudioSystem.getAudioInputStream` funnels EVERY call through a
      * JVM-global `synchronized` provider lookup (JDK13Services), which
      * serializes a 32-thread decode stage on tiny payloads. The provider
      * instances are the same stateless singletons AudioSystem hands out
      * concurrently; walking a cached list is the identical decode minus
      * the lock. Ordering mirrors JDK13Services: JDK-internal
      * (com.sun.media.sound.) providers first, first success wins —
      * EXCEPT SoftMidiAudioFileReader, which goes LAST: its per-probe
      * `MidiSystem.getSequence` re-enters the same JVM-global
      * synchronized lookup (JSSecurityManager.getProviders — jstack
      * showed all 32 decode threads BLOCKED on it), and the JDK readers'
      * container magics are disjoint (RIFF/FORM/.snd/MThd), so a reader
      * that accepts a payload is unique and the move cannot change which
      * one wins. */
    private[ops] lazy val audioFileReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      var jdk = List.empty[javax.sound.sampled.spi.AudioFileReader]
      var ext = List.empty[javax.sound.sampled.spi.AudioFileReader]
      var midi = List.empty[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) {
        val r = it.next()
        if (r.getClass.getName.contains("SoftMidi")) midi ::= r
        else if (r.getClass.getName.startsWith("com.sun.media.sound.")) jdk ::= r
        else ext ::= r
      }
      jdk.reverse ::: ext.reverse ::: midi.reverse
    }

    /** `AudioSystem.getAudioInputStream(stream)` semantics over the cached
      * provider list: first reader that accepts wins, unsupported-format
      * probes fall through, null when none accepts. */
    private[ops] def openAudioStream(
        bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      val in = new java.io.ByteArrayInputStream(bytes)
      val it = audioFileReaders.iterator
      while (it.hasNext) {
        try return it.next().getAudioInputStream(in)
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => ()
        }
      }
      null
    }

    /** Decode and fold sample stats in one pass; None when the payload is
      * not a WAV `AudioSystem` accepts or not 16-bit signed PCM. */
    def decodeStats(bytes: Array[Byte]): Option[AudioStats] = {
      if (bytes == null || bytes.length == 0) return None
      val ais =
        try openAudioStream(bytes)
        catch { case _: Exception => null }
      if (ais == null) return None
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) return None
        val pcm = ais.readAllBytes()
        val le = !fmt.isBigEndian
        var i = 0; var sumAbs = 0L; var peak = 0; var zc = 0L
        var prevNeg = false; var first = true
        while (i + 1 < pcm.length) {
          val lo = pcm(i) & 0xFF; val hi = pcm(i + 1) & 0xFF
          val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
          val a = math.abs(s) // |Short.MinValue| fits an Int
          sumAbs += a; if (a > peak) peak = a
          val neg = s < 0
          if (!first && neg != prevNeg) zc += 1
          prevNeg = neg; first = false
          i += 2
        }
        Some(AudioStats(fmt.getSampleRate.toInt, pcm.length / 2, sumAbs, peak, zc))
      } finally ais.close()
    }

    /** Encode mono 16-bit PCM samples as a WAV container (lossless, so a
      * real decoder must invert it exactly) — the fixture minter used by
      * `media_audio` and the specs. */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      // the canonical 44-byte RIFF/WAVE header + LE PCM16 payload —
      // byte-identical to what `AudioSystem.write(..., Type.WAVE, ...)`
      // emits for this format, minus the provider/stream plumbing per
      // call (the DECODE side still goes through AudioSystem: the
      // fixture must survive a real javax.sound parse)
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      def le32(o: Int, v: Int): Unit = {
        out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
        out(o + 2) = ((v >> 16) & 0xFF).toByte; out(o + 3) = ((v >> 24) & 0xFF).toByte
      }
      def le16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      }
      def tag(o: Int, s: String): Unit = {
        var i = 0
        while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
      }
      tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
      tag(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, 1 /* mono */)
      le32(24, sampleRate); le32(28, sampleRate * 2 /* byte rate */)
      le16(32, 2 /* block align */); le16(34, 16 /* bits */)
      tag(36, "data"); le32(40, dataLen)
      var i = 0
      while (i < samples.length) {
        out(44 + 2 * i) = (samples(i) & 0xFF).toByte
        out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      out
    }

    /** The former AudioSystem-driven encoder, kept for the spec that pins
      * byte-level agreement between the two paths. */
    private[ops] def encodeWavViaAudioSystem(sampleRate: Int,
                                             samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
        true /* signed */, false /* little-endian */)
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xFF).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Deterministic fixture-WAV sample formula, shared verbatim with the
    * DuckDB oracle: sample i of doc `id` is
    * `((id % 100003) * 131 + i * 7919) % 65536 - 32768` (full int16 range,
    * sign flips included); length is `200 + id % 601` samples at 8 kHz. */
  object FixtureWav {
    val SampleRate = 8000
    def nSamples(id: Long): Int = (200 + id % 601).toInt
    def sample(id: Long, i: Long): Short =
      (((id % 100003) * 131 + i * 7919) % 65536 - 32768).toShort
    def wav(id: Long): Array[Byte] = {
      val n = nSamples(id)
      val s = new Array[Short](n)
      var i = 0
      while (i < n) { s(i) = sample(id, i); i += 1 }
      WavCodec.encodeWav(SampleRate, s)
    }
  }

  /** Synthesize one fixture WAV per row from `idCol` (partition-wise, same
    * codec-init seam as [[synthesizeImages]]). Stands in for a real binary
    * audio column scan in `media_audio`. */
  def synthesizeWavs(df: DataFrame, idCol: String = "doc_id",
                     mediaCol: String = "media"): DataFrame = {
    val schema = df.schema.add(StructField(mediaCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r => Row.fromSeq(r.toSeq :+ FixtureWav.wav(r.getLong(idIdx))) }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise REAL WAV decode → exact integer sample stats
    * (sample_rate, n_samples, sum of |sample|, peak, zero crossings).
    * Null columns when the payload isn't 16-bit mono PCM WAV — callers
    * branch on it rather than silently getting stub numbers. */
  def audioStats(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("sample_rate", IntegerType))
      .add(StructField("n_samples", LongType))
      .add(StructField("sum_abs", LongType))
      .add(StructField("peak", IntegerType))
      .add(StructField("zero_cross", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        WavCodec.decodeStats(bytes) match {
          case Some(s) => Row.fromSeq(r.toSeq ++ Seq[Any](
            s.sampleRate, s.nSamples, s.sumAbs, s.peak, s.zeroCross))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Synthesize one fixture FLAC per row ([[FlacCodec.FixtureFlac]] —
    * SAME sample formula as [[FixtureWav]], compressed encoding with a
    * rotating subframe strategy). Stands in for a real compressed-audio
    * column scan in `media_flac`. */
  def synthesizeFlacs(df: DataFrame, idCol: String = "doc_id",
                      mediaCol: String = "media"): DataFrame = {
    val schema = df.schema.add(StructField(mediaCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ FlacCodec.FixtureFlac.bytes(r.getLong(idIdx)))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise FROM-SCRATCH FLAC decode ([[FlacCodec.decode]] —
    * frames, fixed/LPC predictors, Rice residuals, CRCs; the JDK ships
    * no FLAC reader) → the same exact integer sample stats as
    * [[audioStats]]. Null columns when the payload isn't a mono FLAC
    * this decoder speaks — callers branch, never get stub numbers. */
  def flacStats(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("sample_rate", IntegerType))
      .add(StructField("n_samples", LongType))
      .add(StructField("sum_abs", LongType))
      .add(StructField("peak", IntegerType))
      .add(StructField("zero_cross", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        FlacCodec.decodeStats(bytes) match {
          case Some((sr, n, sumAbs, peak, zc)) => Row.fromSeq(r.toSeq ++
            Seq[Any](sr, n, sumAbs, peak, zc))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Synthesize one fixture MP3 per row ([[Mp3Codec.FixtureMp3]] —
    * real headers, VBR frame sizes, ID3 wrappers; zero-filled spectral
    * payloads, metadata scope). */
  def synthesizeMp3s(df: DataFrame, idCol: String = "doc_id",
                     mediaCol: String = "media"): DataFrame = {
    val schema = df.schema.add(StructField(mediaCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ Mp3Codec.FixtureMp3.bytes(r.getLong(idIdx)))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise REAL MP3 frame-header walk ([[Mp3Codec.meta]]) →
    * stream metadata (sample_rate, channels, n_frames, exact summed
    * frame bytes, integer duration). Null columns when the payload
    * isn't an MPEG-1 Layer III stream — callers branch rather than
    * silently getting stub numbers. */
  def mp3Meta(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("sample_rate", IntegerType))
      .add(StructField("channels", IntegerType))
      .add(StructField("n_frames", IntegerType))
      .add(StructField("frame_bytes", LongType))
      .add(StructField("duration_ms", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        Mp3Codec.meta(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some(m) => Row.fromSeq(r.toSeq ++ Seq[Any](
            m.sampleRate, m.channels, m.nFrames, m.frameBytes, m.durationMs))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Synthesize one fixture MJPEG AVI per row ([[AviCodec.FixtureMjpeg]]
    * — real RIFF framing around real JPEG frames, baseline and
    * progressive mixed). */
  def synthesizeMjpegs(df: DataFrame, idCol: String = "doc_id",
                       mediaCol: String = "media"): DataFrame = {
    val schema = df.schema.add(StructField(mediaCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ AviCodec.FixtureMjpeg.bytes(r.getLong(idIdx)))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise REAL VIDEO decode ([[AviCodec.mjpegStats]]: RIFF
    * walk + per-frame [[JpegCodec]]) → exact integer frame/pixel stats.
    * Null columns when the payload isn't an MJPEG AVI this stack
    * speaks — callers branch, never get stub numbers. */
  def mjpegVideoStats(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("n_frames", IntegerType))
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("gray_sum", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        AviCodec.mjpegStats(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some(s) => Row.fromSeq(r.toSeq ++ Seq[Any](
            s.nFrames, s.width, s.height, s.graySum))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** REAL ISO-BMFF (MP4) container parsing — video METADATA without any
    * codec decode. Honest scope: frame PIXELS need compressed-video
    * codecs this container never ships (that remains the documented
    * [[DecodeStub]] seam), but the container structure is the published
    * ISO/IEC 14496-12 box grammar, and every number a pipeline filters
    * or buckets video by — brand, timescale, duration, track
    * dimensions, sample count/bytes — lives in boxes this parser walks
    * for real: size/type headers (64-bit `largesize` handled),
    * containers (`moov`/`trak`/`mdia`/`minf`/`stbl`) recursed, `mvhd`
    * version 0 AND 1 layouts, `tkhd` 16.16 fixed-point width/height,
    * `stsz` sample table. */
  object Mp4Codec {
    final case class Mp4Meta(brand: String, timescale: Long, duration: Long,
                             width: Int, height: Int, nSamples: Int,
                             sampleBytes: Long)

    private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)

    /** Walk the box tree, folding the metadata. None if the bytes are
      * not a box structure with an `ftyp`. */
    def parseMeta(bytes: Array[Byte]): Option[Mp4Meta] = {
      if (bytes == null || bytes.length < 16) return None
      var brand: Option[String] = None
      var timescale = 0L; var duration = 0L
      var width = 0; var height = 0
      var nSamples = 0; var sampleBytes = 0L
      def walk(from: Long, to: Long): Unit = {
        var off = from
        while (off + 8 <= to) {
          var size = be32(bytes, off.toInt)
          val tpe = new String(bytes, off.toInt + 4, 4, "ISO-8859-1")
          var header = 8L
          if (size == 1) { size = be64(bytes, off.toInt + 8); header = 16L }
          else if (size == 0) size = to - off // box extends to EOF
          require(size >= header && off + size <= to,
            s"corrupt box $tpe at $off (size $size)")
          val body = off + header
          tpe match {
            case "ftyp" =>
              brand = Some(new String(bytes, body.toInt, 4, "ISO-8859-1"))
            case t if Containers(t) => walk(body, off + size)
            case "mvhd" =>
              val v = bytes(body.toInt) & 0xff
              if (v == 1) { // 64-bit times: skip version/flags + 2x8 dates
                timescale = be32(bytes, body.toInt + 20)
                duration = be64(bytes, body.toInt + 24)
              } else {
                timescale = be32(bytes, body.toInt + 12)
                duration = be32(bytes, body.toInt + 16)
              }
            case "tkhd" =>
              val v = bytes(body.toInt) & 0xff
              // width/height are the LAST 8 bytes of the box, 16.16 fixed
              val wOff = (off + size - 8).toInt
              width = (be32(bytes, wOff) >> 16).toInt
              height = (be32(bytes, wOff + 4) >> 16).toInt
              val _ = v
            case "stsz" =>
              val uniform = be32(bytes, body.toInt + 4)
              val n = be32(bytes, body.toInt + 8).toInt
              nSamples = n
              sampleBytes =
                if (uniform != 0) uniform * n.toLong
                else (0 until n).map(i => be32(bytes, body.toInt + 12 + 4 * i)).sum
            case _ => () // mdat, stsd, stts, stco, hdlr, mdhd — skipped
          }
          off += size
        }
      }
      try {
        walk(0L, bytes.length.toLong)
        brand.map(b => Mp4Meta(b, timescale, duration, width, height,
          nSamples, sampleBytes))
      } catch { case _: Exception => None }
    }

    // ---- fixture minting (spec-correct minimal file) ----

    private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val size = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(size)
      bb.putInt(size).put(tpe.getBytes("ISO-8859-1"))
      payload.foreach(bb.put)
      bb.array
    }
    private def fullBox(tpe: String, version: Int, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + payload.length)
      bb.putInt(version << 24).put(payload)
      box(tpe, bb.array)
    }
    private def ints(vals: Long*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vals.length)
      vals.foreach(v => bb.putInt(v.toInt))
      bb.array
    }

    /** Minimal valid MP4: ftyp + moov(mvhd v0, trak(tkhd, mdia(mdhd,
      * hdlr, minf(stbl(stsd, stts, stsz, stco))))) + mdat of the
      * declared sample bytes. */
    def buildMinimal(brand: String, timescale: Int, durationTicks: Long,
                     width: Int, height: Int, sampleSizes: Seq[Int],
                     mvhdV1: Boolean = false): Array[Byte] = {
      val ftyp = box("ftyp", brand.getBytes("ISO-8859-1"), ints(0), "isom".getBytes("ISO-8859-1"))
      val mvhd =
        if (mvhdV1) {
          // v1: 64-bit creation/modification/duration, 32-bit timescale
          val bb = java.nio.ByteBuffer.allocate(28)
          bb.putLong(0L).putLong(0L).putInt(timescale).putLong(durationTicks)
          fullBox("mvhd", 1, bb.array ++ new Array[Byte](76) ++ ints(2))
        } else fullBox("mvhd", 0, ints(0, 0, timescale.toLong, durationTicks,
          0x00010000L, 0x01000000L >> 16) ++ new Array[Byte](70) ++ ints(2))
      val tkhd = fullBox("tkhd", 0, ints(0, 0, 1, 0, durationTicks) ++
        new Array[Byte](52) ++ ints(width.toLong << 16, height.toLong << 16))
      val mdhd = fullBox("mdhd", 0, ints(0, 0, timescale.toLong, durationTicks, 0))
      val hdlr = fullBox("hdlr", 0, ints(0) ++ "vide".getBytes("ISO-8859-1") ++
        new Array[Byte](13))
      val stsd = fullBox("stsd", 0, ints(0))
      val stts = fullBox("stts", 0, ints(1, sampleSizes.length.toLong,
        if (sampleSizes.isEmpty) 0L else durationTicks / math.max(1, sampleSizes.length)))
      val stsz = fullBox("stsz", 0,
        ints((0L +: sampleSizes.length.toLong +: sampleSizes.map(_.toLong)): _*))
      val stco = fullBox("stco", 0, ints(1, 0))
      val stbl = box("stbl", stsd, stts, stsz, stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      val moov = box("moov", mvhd, trak)
      val mdat = box("mdat", new Array[Byte](sampleSizes.sum))
      ftyp ++ moov ++ mdat
    }
  }

  /** Deterministic fixture MP4 per doc id (the parameters the oracle
    * recomputes arithmetically). */
  private[graft] object FixtureMp4 {
    def params(id: Long): (Int, Int, Int, Int, Seq[Int]) = {
      val timescale = 600 * (1 + (id % 4)).toInt
      val n = (3 + id % 6).toInt
      val width = 160 + ((id % 5) * 80).toInt
      val height = 120 + ((id % 3) * 60).toInt
      val sizes = (0 until n).map(i => 50 + ((id + i) % 40).toInt)
      (timescale, width, height, n, sizes)
    }
    def mp4(id: Long): Array[Byte] = {
      val (timescale, w, h, n, sizes) = params(id)
      Mp4Codec.buildMinimal("isom", timescale, 100L * n, w, h, sizes)
    }
  }

  /** Synthesize one fixture MP4 per row from `idCol` (partition-wise). */
  def synthesizeMp4s(df: DataFrame, idCol: String = "doc_id",
                     mediaCol: String = "media"): DataFrame = {
    val schema = df.schema.add(StructField(mediaCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r => Row.fromSeq(r.toSeq :+ FixtureMp4.mp4(r.getLong(idIdx))) }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise REAL MP4 box-structure parse → container metadata
    * (brand, timescale, integer duration_ms, track dimensions, sample
    * count + bytes). Null columns when the payload is not an ISO-BMFF
    * stream — callers branch rather than silently getting stub numbers. */
  def mp4Meta(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("brand", StringType))
      .add(StructField("timescale", LongType))
      .add(StructField("duration_ms", LongType))
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("n_samples", IntegerType))
      .add(StructField("sample_bytes", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        Multimodal.Mp4Codec.parseMeta(bytes) match {
          case Some(m) => Row.fromSeq(r.toSeq ++ Seq[Any](
            m.brand, m.timescale,
            if (m.timescale == 0) null else m.duration * 1000L / m.timescale,
            m.width, m.height, m.nSamples, m.sampleBytes))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null, null))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Synthesize one fixture PNG per row from `idCol` (partition-wise; the
    * encoder is the per-partition "codec init" seam). Stands in for a real
    * binary image column scan in `media_features`. */
  def synthesizeImages(df: DataFrame, idCol: String = "doc_id",
                       mediaCol: String = "media"): DataFrame = {
    val schema = df.schema.add(StructField(mediaCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r => Row.fromSeq(r.toSeq :+ FixtureImage.png(r.getLong(idIdx))) }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** One deterministic baseline JPEG per row ([[JpegCodec.FixtureJpeg]]
    * — DC-only flat blocks, every fifth doc restart-marked): the
    * lossless-by-construction fixture that lets an arithmetic oracle
    * replay a LOSSY format's decode exactly. */
  def synthesizeJpegs(df: DataFrame, idCol: String = "doc_id",
                      mediaCol: String = "media"): DataFrame = {
    val schema = df.schema.add(StructField(mediaCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ JpegCodec.FixtureJpeg.bytes(r.getLong(idIdx)))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise FROM-SCRATCH JPEG decode ([[JpegCodec.decode]] —
    * Huffman + dequant + IDCT + level shift, baseline AND progressive
    * (SOF2) frames, NOT `javax.imageio`) → exact integer stats (width,
    * height, gray_sum = Σ raw samples). Null row when the payload
    * isn't a JPEG this decoder speaks (arithmetic/12-bit/CMYK refuse
    * loudly rather than guess). */
  def jpegFeatures(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("gray_sum", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        JpegCodec.decodeStats(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some(s) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](s.width, s.height, s.sumR))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise REAL decode → exact integer pixel stats (width, height,
    * channels, per-channel sums). Null row when the payload isn't a
    * decodable image — callers branch on it rather than silently getting
    * stub numbers. */
  def imageStats(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("channels", IntegerType))
      .add(StructField("sum_r", LongType))
      .add(StructField("sum_g", LongType))
      .add(StructField("sum_b", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        ImageIoCodec.decodeStats(bytes) match {
          // Seq[Any] defeats Scala's weak-conformance widening of the Int
          // dims to Long (which the INT columns' encoder rejects)
          case Some(s) => Row.fromSeq(r.toSeq ++ Seq[Any](
            s.width, s.height, s.channels, s.sumR, s.sumG, s.sumB))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise REAL conv-bank embedding over decoded pixels
    * ([[ImageIoCodec.convEnergies]]): Sobel-x / Sobel-y / Laplacian
    * response energies (abs nonlinearity, global sum pool) — integer-
    * exact, so the DuckDB oracle replays the numbers arithmetically from
    * the fixture-pixel formula. Null row for undecodable payloads. */
  def imageConvEmbed(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("grad_x_energy", LongType))
      .add(StructField("grad_y_energy", LongType))
      .add(StructField("lap_energy", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        ImageIoCodec.convEnergies(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some((gx, gy, lap)) => Row.fromSeq(r.toSeq ++ Seq(gx, gy, lap))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Partition-wise REAL decode → the FULL production feature basis in
    * ONE pass: exactly the dims [[ImageIoCodec.features]] derives for
    * the image leg (width, height, channels, per-channel sums, and the
    * conv bank's gradient energies — `features()` emits `sum/n` and
    * `energy/n`; these are the integer numerators), so the whole image
    * feature vector is oracle-replayable bit-for-bit. Null row for
    * undecodable payloads (the seam where [[DecodeStub]] takes over). */
  def imageFeatures(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = df.schema
      .add(StructField("width", IntegerType))
      .add(StructField("height", IntegerType))
      .add(StructField("channels", IntegerType))
      .add(StructField("sum_r", LongType))
      .add(StructField("sum_g", LongType))
      .add(StructField("sum_b", LongType))
      .add(StructField("grad_x_energy", LongType))
      .add(StructField("grad_y_energy", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val img = ImageIoCodec.decodeImage(bytes) // ONE decode, both stats
        if (img == null) Row.fromSeq(r.toSeq ++ Seq.fill(8)(null))
        else {
          val s = ImageIoCodec.statsOf(img)
          val (gx, gy, _) =
            ImageIoCodec.convEnergiesOf(img).getOrElse((0L, 0L, 0L))
          Row.fromSeq(r.toSeq ++ Seq[Any](
            s.width, s.height, s.channels, s.sumR, s.sumG, s.sumB, gx, gy))
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

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
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      // per-partition init of the (stub) codec happens here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val out = if (bytes == null) null else ImageIoCodec.resize(bytes, w, h)
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
    val rdd = Spread.spread(df).rdd.mapPartitions { rows =>
      // per-partition init of the (stub) codec happens here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val feats = if (bytes == null) null else ImageIoCodec.features(bytes)
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
