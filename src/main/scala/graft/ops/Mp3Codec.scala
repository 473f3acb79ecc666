package graft.ops

/** REAL MPEG-1 Layer III (MP3) frame-header walking — audio METADATA
  * without PCM decode, the same honest scope as
  * [[Multimodal.Mp4Codec]] for video: full lossy decode (hybrid
  * filterbank, Huffman spectral data) stays behind the documented
  * [[Multimodal.DecodeStub]] seam, but every number a pipeline filters
  * or buckets audio by — frame count, sample rate, channel mode,
  * exact per-frame byte sizes (the public bitrate/padding formula),
  * integer duration — comes from really parsing the container:
  *
  *  - ID3v2 prefix skipped by its syncsafe size; trailing ID3v1 `TAG`
  *    block recognized;
  *  - per frame: 11-bit sync, version/layer gates (MPEG-1 Layer III),
  *    bitrate + sample-rate table lookups, padding bit, channel mode —
  *    frame length `144 * bitrate / sampleRate + padding` walked
  *    EXACTLY (VBR streams supported: the bitrate may change per
  *    frame);
  *  - free-format/reserved codes, mid-stream desync, and cross-frame
  *    sample-rate/channel inconsistencies refuse loudly (`None`).
  *
  * The `media_mp3_meta` oracle replays the frame-size arithmetic from
  * the fixture formula — the Spark side must walk a real byte stream
  * to match. */
object Mp3Codec {

  final case class Mp3Meta(sampleRate: Int, channels: Int, nFrames: Int,
                           frameBytes: Long, durationMs: Long)

  /** MPEG-1 Layer III bitrate table (kbps); index 0 = free format
    * (refused — frame walking needs a defined length), 15 = invalid. */
  private val BitrateKbps = Array(
    -1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val SampleRatesHz = Array(44100, 48000, 32000, -1)
  private val SamplesPerFrame = 1152 // MPEG-1 Layer III

  private final class Mp3FormatException(msg: String)
      extends RuntimeException(msg)

  def meta(bytes: Array[Byte]): Option[Mp3Meta] =
    try metaStrict(bytes)
    catch {
      case _: Mp3FormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  private def metaStrict(bytes: Array[Byte]): Option[Mp3Meta] = {
    if (bytes == null || bytes.length < 4) return None
    var pos = 0
    // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      pos = 10 + size
    }
    var sr = -1
    var ch = -1
    var frames = 0
    var frameBytes = 0L
    while (pos < bytes.length) {
      // trailing ID3v1 tag: exactly 128 bytes starting "TAG"
      if (bytes.length - pos == 128 && bytes(pos) == 'T' &&
          bytes(pos + 1) == 'A' && bytes(pos + 2) == 'G')
        pos = bytes.length
      else {
        if (pos + 4 > bytes.length)
          throw new Mp3FormatException("EOF inside frame header")
        val b1 = bytes(pos) & 0xFF
        val b2 = bytes(pos + 1) & 0xFF
        val b3 = bytes(pos + 2) & 0xFF
        val b4 = bytes(pos + 3) & 0xFF
        if (b1 != 0xFF || (b2 & 0xE0) != 0xE0)
          throw new Mp3FormatException(s"lost frame sync at $pos")
        val version = (b2 >> 3) & 3
        val layer = (b2 >> 1) & 3
        if (version != 3) // MPEG-2/2.5 out of declared scope
          throw new Mp3FormatException("not MPEG-1")
        if (layer != 1) // Layer III only
          throw new Mp3FormatException("not Layer III")
        val brIdx = (b3 >> 4) & 0xF
        val srIdx = (b3 >> 2) & 3
        val padding = (b3 >> 1) & 1
        val kbps = BitrateKbps(brIdx)
        if (kbps <= 0)
          throw new Mp3FormatException("free-format/invalid bitrate")
        val rate = SampleRatesHz(srIdx)
        if (rate <= 0) throw new Mp3FormatException("invalid sample rate")
        val mode = (b4 >> 6) & 3
        val chans = if (mode == 3) 1 else 2
        if (sr >= 0 && (sr != rate || ch != chans))
          throw new Mp3FormatException(
            "sample rate / channel mode changed mid-stream")
        sr = rate
        ch = chans
        // the public Layer III frame-length formula (header included)
        val frameLen = 144 * (kbps * 1000) / rate + padding
        if (pos + frameLen > bytes.length)
          throw new Mp3FormatException("truncated frame")
        frames += 1
        frameBytes += frameLen
        pos += frameLen
      }
    }
    if (frames == 0) None
    else Some(Mp3Meta(sr, ch, frames, frameBytes,
      frames.toLong * SamplesPerFrame * 1000L / sr))
  }

  // ==== fixture builder (tests + oracle queries) ======================

  /** Build a REAL MPEG-1 Layer III stream with zero-filled payloads:
    * valid sync/headers, per-frame bitrate index (VBR), padding bits —
    * everything the walker reads is honest; only the spectral payload
    * is silence-of-zeros (metadata scope, like the MP4 fixture). */
  def buildFrames(sampleRateIdx: Int, mono: Boolean,
                  frameSpecs: Seq[(Int, Int)], // (bitrateIdx, paddingBit)
                  id3v2: Boolean = false, id3v1: Boolean = false)
      : Array[Byte] = {
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2, "sample rate index")
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2) {
      val tagBody = 17
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0) // version 2.3.0
      out.write(0) // flags
      out.write((tagBody >> 21) & 0x7F); out.write((tagBody >> 14) & 0x7F)
      out.write((tagBody >> 7) & 0x7F); out.write(tagBody & 0x7F)
      var i = 0
      while (i < tagBody) { out.write(0); i += 1 }
    }
    val rate = SampleRatesHz(sampleRateIdx)
    frameSpecs.foreach { case (brIdx, padding) =>
      val kbps = BitrateKbps(brIdx)
      require(kbps > 0, s"bitrate index $brIdx")
      require(padding == 0 || padding == 1, "padding bit")
      val frameLen = 144 * (kbps * 1000) / rate + padding
      out.write(0xFF)
      out.write(0xFB) // sync | MPEG-1 | Layer III | no CRC
      out.write((brIdx << 4) | (sampleRateIdx << 2) | (padding << 1))
      out.write(if (mono) 0xC0 else 0x00) // mode (+ zero ext/flags)
      var i = 4
      while (i < frameLen) { out.write(0); i += 1 }
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      var i = 3
      while (i < 128) { out.write(0); i += 1 }
    }
    out.toByteArray
  }

  /** The `media_mp3_meta` fixture family — all parameters pure
    * arithmetic in `id` so the DuckDB oracle replays them: sample rate
    * rotates 44.1/48/32 kHz, mono every 4th doc, `5 + id % 7` frames,
    * frame `i` at bitrate index `1 + (id + i) % 14` (VBR) with padding
    * `(id + i) % 2`; every 3rd doc carries an ID3v2 prefix, every 5th
    * a trailing ID3v1 tag (both must be walked over, not counted). */
  object FixtureMp3 {
    def bytes(id: Long): Array[Byte] = {
      val srIdx = (id % 3).toInt
      val n = (5 + id % 7).toInt
      val specs = (0 until n).map(i =>
        (1 + ((id + i) % 14).toInt, ((id + i) % 2).toInt))
      buildFrames(srIdx, mono = id % 4 == 0, specs,
        id3v2 = id % 3 == 0, id3v1 = id % 5 == 0)
    }
  }
}
