package graft.ops

/** REAL VIDEO PIXELS — MJPEG-in-AVI: a RIFF/AVI container walk whose
  * video chunks each hold one complete JPEG, decoded by the repo's
  * from-scratch [[JpegCodec]]. This closes the "video decode" seam for
  * one real-world format with machinery that is already spec-pinned:
  * Motion-JPEG is what cameras/capture pipelines emit when they don't
  * do inter-frame compression, and its AVI framing is the public RIFF
  * grammar (little-endian chunk sizes, even padding, LIST containers):
  *
  *  - `RIFF 'AVI '` → `LIST hdrl` (avih main header: width, height,
  *    total frames) → `LIST movi` ('00dc'/'00db' chunks = one
  *    compressed frame each, even-padded);
  *  - every frame decodes through [[JpegCodec.decode]] — baseline OR
  *    progressive — and must agree with the container's declared
  *    dimensions; a frame count mismatch, undecodable frame, or
  *    malformed chunk tree refuses (`None`), never partial pixels.
  *
  * Inter-frame codecs (H.264 & co) remain the documented
  * [[Multimodal.DecodeStub]] seam — this is the honest subset a
  * from-scratch stack can decode for real. */
object AviCodec {

  /** Per-stream stats: frame count, declared dims, and the SUM over
    * frames of raw gray sample sums (the arithmetic the oracle
    * replays). */
  final case class MjpegStats(nFrames: Int, width: Int, height: Int,
                              graySum: Long)

  private final class AviFormatException(msg: String)
      extends RuntimeException(msg)

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourCC(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode an MJPEG AVI into per-frame rasters (lazily summed by
    * [[mjpegStats]]); `None` when the container or ANY frame refuses. */
  def mjpegStats(bytes: Array[Byte]): Option[MjpegStats] =
    try statsStrict(bytes)
    catch {
      case _: AviFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  private def statsStrict(bytes: Array[Byte]): Option[MjpegStats] = {
    var nFrames = 0
    var graySum = 0L
    walkMjpeg(bytes) { r =>
      var i = 0
      if (r.channels == 1) {
        while (i < r.data.length) { graySum += r.data(i) & 0xFF; i += 1 }
      } else { // integer BT.601-ish luma is lossy; sum R like jpegFeatures
        while (i < r.data.length) { graySum += r.data(i) & 0xFF; i += 3 }
      }
      nFrames += 1
    }.map { case (w, h) => MjpegStats(nFrames, w, h, graySum) }
  }

  /** Every decoded frame raster of an MJPEG AVI, in stream order —
    * the per-frame access perceptual video hashing needs. None when
    * the payload isn't an MJPEG AVI this stack speaks. */
  def mjpegFrameRasters(bytes: Array[Byte])
      : Option[Seq[JpegCodec.Raster]] =
    try {
      val out = Seq.newBuilder[JpegCodec.Raster]
      walkMjpeg(bytes)(out += _).map(_ => out.result())
    } catch {
      case _: AviFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Shared RIFF/AVI walk: container grammar + consistency checks,
    * every 'NNdc'/'NNdb' frame JPEG-decoded and handed to `onFrame`.
    * Returns the container dims, None for a non-AVI payload; throws
    * [[AviFormatException]] on grammar/consistency violations. */
  private def walkMjpeg(bytes: Array[Byte])(
      onFrame: JpegCodec.Raster => Unit): Option[(Int, Int)] = {
    if (bytes == null || bytes.length < 24) return None
    if (fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "AVI ") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + le32(bytes, 4)).toInt
    var width = -1
    var height = -1
    var declaredFrames = -1
    var nFrames = 0

    def walk(from: Int, until: Int): Unit = {
      var p = from
      while (p + 8 <= until) {
        val cc = fourCC(bytes, p)
        val size = le32(bytes, p + 4)
        if (size < 0 || p + 8 + size > until)
          throw new AviFormatException(s"chunk '$cc' overruns its parent")
        val body = p + 8
        val bodyEnd = (body + size).toInt
        if (cc == "LIST") {
          // list type fourCC then sub-chunks
          if (size < 4) throw new AviFormatException("short LIST")
          walk(body + 4, bodyEnd)
        } else if (cc == "avih") {
          if (size < 40) throw new AviFormatException("short avih")
          declaredFrames = le32(bytes, body + 16).toInt
          width = le32(bytes, body + 32).toInt
          height = le32(bytes, body + 36).toInt
        } else if (cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
            (cc.substring(2) == "dc" || cc.substring(2) == "db")) {
          val frame = java.util.Arrays.copyOfRange(bytes, body, bodyEnd)
          val r = JpegCodec.decode(frame).getOrElse(
            throw new AviFormatException(s"undecodable frame $nFrames"))
          if (width >= 0 && (r.width != width || r.height != height))
            throw new AviFormatException(
              s"frame $nFrames is ${r.width}x${r.height}, container " +
                s"declares ${width}x$height")
          onFrame(r)
          nFrames += 1
        }
        // chunks are padded to EVEN byte boundaries
        p = bodyEnd + (size & 1L).toInt
      }
    }
    walk(12, riffEnd)
    if (nFrames == 0 || width < 0) return None
    if (declaredFrames >= 0 && declaredFrames != nFrames)
      throw new AviFormatException(
        s"container declares $declaredFrames frames, movi holds $nFrames")
    Some((width, height))
  }

  // ==== fixture builder (tests + oracle queries) ======================

  /** Build a REAL RIFF/AVI wrapping the given JPEG frames: avih with
    * the declared dims/frame count, a vids/MJPG stream header, movi
    * with even-padded '00dc' chunks. Every structure the walker reads
    * is honest. */
  def buildMjpeg(width: Int, height: Int,
                 frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def cc(s: String): Unit = s.foreach(c => out.write(c.toInt))
    def listOf(listType: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      listType.foreach(c => b.write(c.toInt))
      b.write(body, 0, body.length)
      b.toByteArray
    }
    def bytesOf(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); f(b); b.toByteArray
    }
    def le32b(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
      b.write((v & 0xFF).toInt); b.write(((v >> 8) & 0xFF).toInt)
      b.write(((v >> 16) & 0xFF).toInt); b.write(((v >> 24) & 0xFF).toInt)
    }
    val avih = bytesOf { b =>
      le32b(b, 40000L) // usec per frame (25 fps)
      le32b(b, 0L); le32b(b, 0L); le32b(b, 0x10L) // maxbytes, pad, flags
      le32b(b, frames.length.toLong) // total frames
      le32b(b, 0L); le32b(b, 1L); le32b(b, 0L) // initial, streams, bufsize
      le32b(b, width.toLong); le32b(b, height.toLong)
      (0 until 4).foreach(_ => le32b(b, 0L))
    }
    val strh = bytesOf { b =>
      "vids".foreach(c => b.write(c.toInt))
      "MJPG".foreach(c => b.write(c.toInt))
      le32b(b, 0L); le32b(b, 0L); le32b(b, 0L) // flags, prio+lang, frames
      le32b(b, 1L); le32b(b, 25L) // scale, rate
      le32b(b, 0L); le32b(b, frames.length.toLong) // start, length
      le32b(b, 0L); le32b(b, 0L); le32b(b, 0L); le32b(b, 0L)
    }
    val strf = bytesOf { b => // BITMAPINFOHEADER
      le32b(b, 40L); le32b(b, width.toLong); le32b(b, height.toLong)
      b.write(1); b.write(0); b.write(24); b.write(0) // planes, bitcount
      "MJPG".foreach(c => b.write(c.toInt))
      le32b(b, 0L); le32b(b, 0L); le32b(b, 0L); le32b(b, 0L); le32b(b, 0L)
    }
    // assemble inner lists first so sizes are exact
    val strl = {
      val b = new java.io.ByteArrayOutputStream()
      def sub(tag: String, body: Array[Byte]): Unit = {
        tag.foreach(c => b.write(c.toInt)); le32b(b, body.length.toLong)
        b.write(body, 0, body.length)
        if ((body.length & 1) == 1) b.write(0)
      }
      sub("strh", strh); sub("strf", strf)
      b.toByteArray
    }
    val hdrl = {
      val b = new java.io.ByteArrayOutputStream()
      def sub(tag: String, body: Array[Byte]): Unit = {
        tag.foreach(c => b.write(c.toInt)); le32b(b, body.length.toLong)
        b.write(body, 0, body.length)
        if ((body.length & 1) == 1) b.write(0)
      }
      sub("avih", avih)
      val strlList = listOf("strl", strl)
      b.write('L'); b.write('I'); b.write('S'); b.write('T')
      le32b(b, strlList.length.toLong)
      b.write(strlList, 0, strlList.length)
      b.toByteArray
    }
    val movi = {
      val b = new java.io.ByteArrayOutputStream()
      frames.foreach { f =>
        "00dc".foreach(c => b.write(c.toInt)); le32b(b, f.length.toLong)
        b.write(f, 0, f.length)
        if ((f.length & 1) == 1) b.write(0)
      }
      b.toByteArray
    }
    val riffBody = bytesOf { b =>
      "AVI ".foreach(c => b.write(c.toInt))
      def list(listType: String, body: Array[Byte]): Unit = {
        b.write('L'); b.write('I'); b.write('S'); b.write('T')
        le32b(b, (4 + body.length).toLong)
        listType.foreach(c => b.write(c.toInt))
        b.write(body, 0, body.length)
      }
      list("hdrl", hdrl)
      list("movi", movi)
    }
    cc("RIFF"); le(riffBody.length.toLong)
    out.write(riffBody, 0, riffBody.length)
    out.toByteArray
  }

  /** The `media_mjpeg_video` fixture family: `2 + id % 3` frames per
    * doc at [[JpegCodec.FixtureJpeg.dims]]'s per-doc size; frame `f`'s
    * 8x8 block `b` is the flat pixel
    * `((id % 100003) * 31 + f * 11 + b * 7) % 256` — pure arithmetic
    * the oracle replays over (frame, block) pairs. Every third doc's
    * frames encode PROGRESSIVE, every fifth restart-marked (same
    * production mix as the still-image fixture). */
  object FixtureMjpeg {
    def nFrames(id: Long): Int = (2 + id % 3).toInt
    def framePixel(id: Long, f: Int, b: Int): Int =
      (((id % 100003) * 31 + f * 11 + b * 7) % 256).toInt
    def bytes(id: Long): Array[Byte] = {
      val (w, h) = JpegCodec.FixtureJpeg.dims(id)
      val rst = if (id % 5 == 0) 2 else 0
      val frames = (0 until nFrames(id)).map { f =>
        if (id % 3 == 0)
          JpegCodec.encodeGrayDcOnlyProgressive(w, h,
            b => framePixel(id, f, b) - 128, restartInterval = rst)
        else
          JpegCodec.encodeGrayDcOnly(w, h,
            b => framePixel(id, f, b) - 128, restartInterval = rst)
      }
      buildMjpeg(w, h, frames)
    }
  }
}
