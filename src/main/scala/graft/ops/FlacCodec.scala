package graft.ops

/** FROM-SCRATCH FLAC decoder — the COMPRESSED-audio leg of the
  * multimodal codec seam (WAV/PCM is real via `javax.sound`; FLAC was
  * behind the DecodeStub disclosure until now; the JDK ships no FLAC
  * reader at all). Free Lossless Audio Codec, per the public format
  * spec (RFC 9639 / xiph.org):
  *
  *  - `fLaC` magic + metadata blocks (STREAMINFO parsed; others
  *    skipped by length);
  *  - frame headers: 14-bit sync, blocking strategy, coded block
  *    size / sample rate / channel assignment / sample size, UTF-8
  *    coded frame number, CRC-8 VERIFIED;
  *  - subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any
  *    order, signed quantized coefficients + shift), wasted-bits
  *    unary prefix;
  *  - residuals: Rice partitions (4- and 5-bit parameters, escape
  *    codes to raw n-bit), zigzag unfolding;
  *  - stereo decorrelation: independent, left/side, right/side,
  *    mid/side (the lossless mid reconstruction with the side LSB);
  *  - frame CRC-16 VERIFIED — corruption refuses (`None`), never
  *    wrong samples.
  *
  * Lossless means the decoder must INVERT any encoder bit-exactly —
  * the spec pins round-trips against [[FlacCodec.encode]]'s four
  * subframe strategies and hand-built side-channel frames, and the
  * `media_flac` oracle replays the raw-sample formula arithmetically.
  *
  * Scale note: decode is per-payload pure CPU, partition-wise
  * ([[Multimodal]] drives it like every other codec), linear in bytes. */
object FlacCodec {

  /** Decoded PCM: interleaved samples (channel-major within a frame
    * position), `bps`-bit signed values in Int. */
  final case class Pcm(sampleRate: Int, channels: Int, bps: Int,
                       samples: Array[Int])

  private final class FlacFormatException(msg: String)
      extends RuntimeException(msg)

  // ---- CRCs (public polynomials from the format spec) ----------------
  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (bytes(i) & 0xFF)); i += 1 }
    c
  }
  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Table(((c >> 8) ^ (bytes(i) & 0xFF)) & 0xFF) ^ ((c << 8) & 0xFFFF); i += 1 }
    c
  }

  /** MSB-first bit reader (no byte unstuffing — FLAC has none). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length)
          throw new FlacFormatException("EOF in frame data")
        acc = bytes(pos) & 0xFF
        pos += 1
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signedBits(n: Int): Int = {
      val v = bits(n)
      if (n == 32) v // the word IS the signed value
      else if (n > 0 && (v & (1 << (n - 1))) != 0) v - (1 << n)
      else v
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) q += 1
      q
    }
    def alignToByte(): Unit = nbits = 0
  }

  /** Decode FLAC bytes; `None` when the payload is not a FLAC this
    * decoder speaks (wrong magic, reserved codes, CRC mismatch,
    * malformed stream) — callers fall through, never get wrong
    * samples. */
  def decode(bytes: Array[Byte]): Option[Pcm] =
    try decodeStrict(bytes)
    catch {
      case _: FlacFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  private def decodeStrict(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes == null || bytes.length < 42) return None
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' ||
        bytes(3) != 'C') return None
    var pos = 4
    var sampleRate = 0
    var channels = 0
    var bps = 0
    var totalSamples = 0L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (pos + 4 > bytes.length)
        throw new FlacFormatException("EOF in metadata")
      val h = bytes(pos) & 0xFF
      last = (h & 0x80) != 0
      val btype = h & 0x7F
      val len = ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      pos += 4
      if (btype == 0) { // STREAMINFO
        if (len < 34) throw new FlacFormatException("short STREAMINFO")
        val in = new BitReader(bytes, pos)
        in.bits(16): Unit // min block size
        in.bits(16): Unit // max block size
        in.bits(24): Unit // min frame size
        in.bits(24): Unit // max frame size
        sampleRate = in.bits(20)
        channels = in.bits(3) + 1
        bps = in.bits(5) + 1
        totalSamples = in.bitsLong(36)
        sawStreamInfo = true
      } else if (btype == 127) {
        throw new FlacFormatException("invalid metadata block type")
      }
      pos += len
    }
    if (!sawStreamInfo || sampleRate == 0) return None
    if (bps > 32 || channels < 1 || channels > 8) return None

    val collected = Array.newBuilder[Int]
    var got = 0L
    val chBuf = new Array[Array[Int]](channels)

    while (got < totalSamples) {
      val frameStart = pos
      if (pos + 2 > bytes.length)
        throw new FlacFormatException("EOF before frame")
      // 14-bit sync + reserved + blocking strategy
      if ((bytes(pos) & 0xFF) != 0xFF ||
          ((bytes(pos + 1) & 0xFF) & 0xFC) != 0xF8)
        throw new FlacFormatException(s"bad frame sync at $pos")
      val in = new BitReader(bytes, pos + 2)
      val bsCode = in.bits(4)
      val srCode = in.bits(4)
      val chAsgn = in.bits(4)
      val ssCode = in.bits(3)
      if (in.bit() != 0) throw new FlacFormatException("reserved bit set")
      // UTF-8 coded frame/sample number: validate shape, value unused
      val first = in.bits(8)
      val extra =
        if (first < 0x80) 0
        else if ((first & 0xE0) == 0xC0) 1
        else if ((first & 0xF0) == 0xE0) 2
        else if ((first & 0xF8) == 0xF0) 3
        else if ((first & 0xFC) == 0xF8) 4
        else if ((first & 0xFE) == 0xFC) 5
        else if (first == 0xFE) 6
        else throw new FlacFormatException("bad coded number")
      var i = 0
      while (i < extra) {
        if ((in.bits(8) & 0xC0) != 0x80)
          throw new FlacFormatException("bad coded number continuation")
        i += 1
      }
      val blockSize = bsCode match {
        case 0 => throw new FlacFormatException("reserved block size")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => in.bits(8) + 1
        case 7 => in.bits(16) + 1
        case c => 256 << (c - 8)
      }
      srCode match { // frame-local rate must not contradict STREAMINFO use
        case 0 => ()
        case 12 => in.bits(8): Unit
        case 13 | 14 => in.bits(16): Unit
        case 15 => throw new FlacFormatException("invalid sample rate code")
        case _ => ()
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new FlacFormatException("reserved sample size")
      }
      // CRC-8 covers the header bytes up to (not incl.) the CRC byte
      val headerEnd = in.pos // byte-aligned here by construction
      val crcByte = in.bits(8)
      if (crc8(bytes, frameStart, headerEnd) != crcByte)
        throw new FlacFormatException("frame header CRC-8 mismatch")

      val nCh = chAsgn match {
        case a if a <= 7 => a + 1
        case 8 | 9 | 10 => 2
        case _ => throw new FlacFormatException("reserved channel assignment")
      }
      if ((chAsgn <= 7 && nCh != channels) || (chAsgn > 7 && channels != 2))
        throw new FlacFormatException("channel assignment / count mismatch")

      var ch = 0
      while (ch < nCh) {
        // side channels carry one extra bit of range
        val sbBps = frameBps + (chAsgn match {
          case 8 => if (ch == 1) 1 else 0 // left/side
          case 9 => if (ch == 0) 1 else 0 // right/side (side first)
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        })
        chBuf(ch) = decodeSubframe(in, blockSize, sbBps)
        ch += 1
      }
      in.alignToByte()
      val dataEnd = in.pos
      val crc16Read = in.bits(16)
      if (crc16(bytes, frameStart, dataEnd) != crc16Read)
        throw new FlacFormatException("frame CRC-16 mismatch")
      pos = in.pos

      // stereo decorrelation (lossless inverses from the spec)
      chAsgn match {
        case 8 => // left/side: R = L - side
          var j = 0
          while (j < blockSize) {
            chBuf(1)(j) = chBuf(0)(j) - chBuf(1)(j); j += 1
          }
        case 9 => // right/side: stored (side, right); L = R + side
          var j = 0
          while (j < blockSize) {
            val side = chBuf(0)(j)
            chBuf(0)(j) = chBuf(1)(j) + side
            j += 1
          }
        case 10 => // mid/side: mid = (L+R)>>1, side = L-R
          var j = 0
          while (j < blockSize) {
            val side = chBuf(1)(j)
            var mid = chBuf(0)(j)
            mid = (mid << 1) | (side & 1)
            chBuf(0)(j) = (mid + side) >> 1
            chBuf(1)(j) = (mid - side) >> 1
            j += 1
          }
        case _ => ()
      }
      val take = math.min(blockSize.toLong, totalSamples - got).toInt
      var j = 0
      while (j < take) {
        var c = 0
        while (c < channels) { collected += chBuf(c)(j); c += 1 }
        j += 1
      }
      got += take
    }
    Some(Pcm(sampleRate, channels, bps, collected.result()))
  }

  private def decodeSubframe(in: BitReader, blockSize: Int,
                             bps: Int): Array[Int] = {
    if (in.bit() != 0) throw new FlacFormatException("subframe pad bit set")
    val stype = in.bits(6)
    val wasted = if (in.bit() == 1) in.unary() + 1 else 0
    val effBps = bps - wasted
    if (effBps <= 0) throw new FlacFormatException("wasted bits >= bps")
    val out = new Array[Int](blockSize)
    stype match {
      case 0 => // CONSTANT
        val v = in.signedBits(effBps)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { out(i) = in.signedBits(effBps); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0..4
        val order = t - 8
        var i = 0
        while (i < order) { out(i) = in.signedBits(effBps); i += 1 }
        decodeResiduals(in, blockSize, order, out)
        i = order
        while (i < blockSize) {
          out(i) += (order match {
            case 0 => 0
            case 1 => out(i - 1)
            case 2 => 2 * out(i - 1) - out(i - 2)
            case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
            case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
              out(i - 4)
          })
          i += 1
        }
      case t if t >= 32 => // LPC order t-31
        val order = t - 31
        if (order > blockSize)
          throw new FlacFormatException("LPC order > block size")
        var i = 0
        while (i < order) { out(i) = in.signedBits(effBps); i += 1 }
        val precM1 = in.bits(4)
        if (precM1 == 15)
          throw new FlacFormatException("invalid LPC precision")
        val prec = precM1 + 1
        val shift = in.signedBits(5)
        if (shift < 0) throw new FlacFormatException("negative LPC shift")
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = in.signedBits(prec); i += 1 }
        decodeResiduals(in, blockSize, order, out)
        i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) += (acc >> shift).toInt
          i += 1
        }
      case _ => throw new FlacFormatException(s"reserved subframe type $stype")
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Rice-partitioned residuals (T method 0/1) written into
    * `out(order until blockSize)`. */
  private def decodeResiduals(in: BitReader, blockSize: Int, order: Int,
                              out: Array[Int]): Unit = {
    val method = in.bits(2)
    if (method > 1) throw new FlacFormatException("reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = in.bits(4)
    val nPart = 1 << po
    if (blockSize % nPart != 0)
      throw new FlacFormatException("partition order mismatch")
    var idx = order
    var p = 0
    while (p < nPart) {
      val n = (blockSize >> po) - (if (p == 0) order else 0)
      if (n < 0) throw new FlacFormatException("partition shorter than order")
      val param = in.bits(paramBits)
      if (param == escape) {
        val raw = in.bits(5)
        var i = 0
        while (i < n) {
          out(idx) = if (raw == 0) 0 else in.signedBits(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val q = in.unary()
          val u = (q << param) | in.bits(param)
          out(idx) = (u >>> 1) ^ -(u & 1) // zigzag unfold
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  // ==== fixture ENCODER (tests + oracle queries) ======================

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { out.write(acc & 0xFF); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    def putLong(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { put(((v >> i) & 1L).toInt, 1); i -= 1 }
    }
    def flushZero(): Unit = if (nbits > 0) put(0, 8 - nbits)
  }

  /** Subframe strategy for [[encode]]. */
  sealed trait Strategy
  case object Verbatim extends Strategy
  final case class Fixed(order: Int) extends Strategy {
    require(order >= 0 && order <= 4, s"fixed order $order")
  }
  /** A REAL LPC subframe whose quantized coefficients are the fixed
    * predictor's, scaled by `shift` (e.g. order 2, shift 4 -> coefs
    * [32, -16], prediction (32a - 16b) >> 4 = 2a - b): residuals equal
    * the fixed predictor's, but the DECODER walks the full LPC path —
    * precision/shift/coefficient parsing and the 64-bit accumulator. */
  final case class Lpc(order: Int, shift: Int) extends Strategy {
    require(order >= 1 && order <= 4, s"lpc order $order")
    require(shift >= 0 && shift <= 9, s"lpc shift $shift (precision caps at 15)")
  }

  /** Stereo decorrelation mode for [[encode]] — each exercises one of
    * the decoder's lossless channel reconstructions. */
  sealed trait StereoMode
  case object Independent extends StereoMode
  case object LeftSide extends StereoMode
  case object RightSide extends StereoMode
  case object MidSide extends StereoMode

  /** Encode 16-bit PCM as a REAL FLAC stream (one STREAMINFO + fixed
    * 256-sample blocks + correct CRC-8/16): `Verbatim` subframes or
    * `Fixed(order)` predictors with Rice-coded residuals (best 4-bit
    * parameter, escape-to-raw when cheaper). `stereo` picks the
    * decorrelation (side subframes carry bps+1). Lossless by
    * construction — the decode spec pins bit-exact round-trips. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Int],
             strategy: Strategy = Fixed(2),
             stereo: StereoMode = Independent): Array[Byte] = {
    require(channels == 1 || channels == 2, "1 or 2 channels")
    require(stereo == Independent || channels == 2,
      "stereo decorrelation needs stereo input")
    require(samples.length % channels == 0, "ragged channels")
    val bps = 16
    val nFrames0 = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block)
    val si = new java.io.ByteArrayOutputStream()
    val sb = new BitWriter(si)
    val block = 256
    sb.put(block, 16); sb.put(block, 16) // min/max block size
    sb.put(0, 24); sb.put(0, 24) // min/max frame size unknown
    sb.put(sampleRate, 20)
    sb.put(channels - 1, 3)
    sb.put(bps - 1, 5)
    sb.putLong(nFrames0.toLong, 36)
    var i = 0
    while (i < 16) { sb.put(0, 8); i += 1 } // MD5 unset
    sb.flushZero()
    val siBytes = si.toByteArray
    out.write(0x80) // last block, type 0
    out.write(0); out.write((siBytes.length >> 8) & 0xFF)
    out.write(siBytes.length & 0xFF)
    out.write(siBytes, 0, siBytes.length)

    var frameNo = 0L
    var s0 = 0
    while (s0 < nFrames0) {
      val n = math.min(block, nFrames0 - s0)
      val frame = new java.io.ByteArrayOutputStream()
      val bw = new BitWriter(frame)
      bw.put(0x3FFE, 14) // sync
      bw.put(0, 1) // reserved
      bw.put(0, 1) // fixed block size stream
      bw.put(if (n == block) 8 else 7, 4) // 256, or 16-bit at the tail
      bw.put(0, 4) // sample rate from STREAMINFO
      bw.put(stereo match {
        case Independent => channels - 1
        case LeftSide => 8
        case RightSide => 9
        case MidSide => 10
      }, 4)
      bw.put(4, 3) // 16-bit
      bw.put(0, 1)
      // UTF-8 coded frame number
      if (frameNo < 0x80) bw.put(frameNo.toInt, 8)
      else if (frameNo < 0x800) {
        bw.put(0xC0 | (frameNo >> 6).toInt, 8)
        bw.put(0x80 | (frameNo & 0x3F).toInt, 8)
      } else {
        bw.put(0xE0 | (frameNo >> 12).toInt, 8)
        bw.put(0x80 | ((frameNo >> 6) & 0x3F).toInt, 8)
        bw.put(0x80 | (frameNo & 0x3F).toInt, 8)
      }
      if (n != block) bw.put(n - 1, 16)
      bw.flushZero()
      val headerBytes = frame.toByteArray
      frame.write(crc8(headerBytes, 0, headerBytes.length))

      val bw2 = new BitWriter(frame)
      // channel planes for this frame
      val planes: Array[Array[Int]] =
        if (channels == 1)
          Array(Array.tabulate(n)(j => samples(s0 + j)))
        else {
          val l = Array.tabulate(n)(j => samples((s0 + j) * 2))
          val r = Array.tabulate(n)(j => samples((s0 + j) * 2 + 1))
          stereo match {
            case Independent => Array(l, r)
            case LeftSide => Array(l, Array.tabulate(n)(j => l(j) - r(j)))
            case RightSide => Array(Array.tabulate(n)(j => l(j) - r(j)), r)
            case MidSide => Array(
              Array.tabulate(n)(j => (l(j) + r(j)) >> 1),
              Array.tabulate(n)(j => l(j) - r(j)))
          }
        }
      var ch = 0
      while (ch < planes.length) {
        val sideCh = stereo match {
          case LeftSide | MidSide => 1
          case RightSide => 0
          case Independent => -1
        }
        val chBps = bps + (if (ch == sideCh) 1 else 0)
        encodeSubframe(bw2, planes(ch), chBps, strategy)
        ch += 1
      }
      bw2.flushZero()
      val dataBytes = frame.toByteArray
      val c16 = crc16(dataBytes, 0, dataBytes.length)
      frame.write((c16 >> 8) & 0xFF); frame.write(c16 & 0xFF)
      val fb = frame.toByteArray
      out.write(fb, 0, fb.length)
      frameNo += 1
      s0 += n
    }
    out.toByteArray
  }

  /** The fixed predictors' coefficient rows (T.81-era polynomial
    * predictors, public spec constants). */
  private def fixedCoefs(order: Int): Array[Int] = order match {
    case 0 => Array.empty[Int]
    case 1 => Array(1)
    case 2 => Array(2, -1)
    case 3 => Array(3, -3, 1)
    case _ => Array(4, -6, 4, -1)
  }

  private def encodeSubframe(bw: BitWriter, xs: Array[Int], bps: Int,
                             strategy: Strategy): Unit = {
    val n = xs.length
    def putSigned(v: Int, bits: Int): Unit = bw.put(v & ((1 << bits) - 1), bits)
    // WASTED BITS: when every sample shares k low zero bits, the spec
    // lets the subframe carry samples >> k with a unary k prefix — and
    // exercising it here keeps the decoder's path tested
    var wasted = 0
    if (n > 0 && xs.exists(_ != 0)) {
      var all = xs(0)
      var i = 1
      while (i < n) { all |= xs(i); i += 1 }
      while (wasted < 3 && (all & (1 << wasted)) == 0) wasted += 1
    }
    val eff = if (wasted == 0) xs else xs.map(_ >> wasted)
    val effBps = bps - wasted
    def putWasted(): Unit =
      if (wasted == 0) bw.put(0, 1)
      else { // flag + unary(k-1): k-1 zeros then a 1
        bw.put(1, 1)
        var i = 1
        while (i < wasted) { bw.put(0, 1); i += 1 }
        bw.put(1, 1)
      }
    // CONSTANT subframe when the (shifted) signal is flat
    if (n > 0 && eff.forall(_ == eff(0))) {
      bw.put(0, 1); bw.put(0, 6); putWasted()
      putSigned(eff(0), effBps)
      return
    }
    strategy match {
      case Verbatim =>
        bw.put(0, 1); bw.put(1, 6); putWasted()
        var i = 0
        while (i < n) { putSigned(eff(i), effBps); i += 1 }
      case Lpc(order0, shift) =>
        val order = math.min(order0, n)
        bw.put(0, 1); bw.put(31 + order, 6); putWasted()
        var i = 0
        while (i < order) { putSigned(eff(i), effBps); i += 1 }
        val coefs = fixedCoefs(order).map(_ << shift)
        val prec = 6 + shift // fits 4<<shift .. -(6<<shift) signed
        bw.put(prec - 1, 4)
        putSigned(shift, 5)
        i = 0
        while (i < order) { putSigned(coefs(i), prec); i += 1 }
        val res = new Array[Int](n - order)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * eff(i - 1 - j); j += 1 }
          res(i - order) = eff(i) - (acc >> shift).toInt
          i += 1
        }
        writeResiduals(bw, res, effBps, order, n)
        return
      case Fixed(order0) =>
        val order = math.min(order0, n)
        bw.put(0, 1); bw.put(8 + order, 6); putWasted()
        var i = 0
        while (i < order) { putSigned(eff(i), effBps); i += 1 }
        val res = new Array[Int](n - order)
        i = order
        while (i < n) {
          val pred = order match {
            case 0 => 0
            case 1 => eff(i - 1)
            case 2 => 2 * eff(i - 1) - eff(i - 2)
            case 3 => 3 * eff(i - 1) - 3 * eff(i - 2) + eff(i - 3)
            case _ => 4 * eff(i - 1) - 6 * eff(i - 2) + 4 * eff(i - 3) -
              eff(i - 4)
          }
          res(i - order) = eff(i) - pred
          i += 1
        }
        writeResiduals(bw, res, effBps, order, n)
        return
    }
  }

  /** Rice residual block (method 0) — shared by Fixed and Lpc. Uses
    * FOUR partitions when the block divides evenly (each with its own
    * best 4-bit parameter, escape-to-raw when cheaper), so the
    * decoder's multi-partition path runs in every full frame; ragged
    * tail frames fall back to one partition. `order` = predictor
    * order (the first partition is shorter by it), `blockSize` = the
    * subframe's total sample count. */
  private def writeResiduals(bw: BitWriter, res: Array[Int], bps: Int,
                             order: Int, blockSize: Int): Unit = {
    bw.put(0, 2) // method 0 (4-bit params)
    val po =
      if (blockSize % 4 == 0 && blockSize / 4 > order && res.length > 8) 2
      else 0
    bw.put(po, 4)
    val nPart = 1 << po
    val rawBits = math.min(31, bps + 3)
    var idx = 0
    var part = 0
    while (part < nPart) {
      val n = (blockSize >> po) - (if (part == 0) order else 0)
      var best = 0
      var bestCost = Long.MaxValue
      var p = 0
      while (p < 15) {
        var cost = 0L
        var j = 0
        while (j < n) {
          val u = (res(idx + j) << 1) ^ (res(idx + j) >> 31)
          cost += (u >>> p) + 1 + p
          j += 1
        }
        if (cost < bestCost) { bestCost = cost; best = p }
        p += 1
      }
      if (bestCost > n.toLong * rawBits) {
        bw.put(0xF, 4) // escape to raw
        bw.put(rawBits, 5)
        var j = 0
        while (j < n) {
          bw.put(res(idx + j) & ((1 << rawBits) - 1), rawBits); j += 1
        }
      } else {
        bw.put(best, 4)
        var j = 0
        while (j < n) {
          val u = (res(idx + j) << 1) ^ (res(idx + j) >> 31)
          val q = u >>> best
          var k = 0
          while (k < q) { bw.put(0, 1); k += 1 }
          bw.put(1, 1)
          if (best > 0) bw.put(u & ((1 << best) - 1), best)
          j += 1
        }
      }
      idx += n
      part += 1
    }
  }

  /** Exact integer sample stats off a decoded stream — the same shape
    * [[Multimodal.WavCodec.decodeStats]] reports for WAV, so the
    * oracle replays one formula for both audio legs. Mono only (the
    * fixture family); `None` when decode refuses. */
  def decodeStats(bytes: Array[Byte])
      : Option[(Int, Long, Long, Int, Long)] =
    decode(bytes).filter(_.channels == 1).map { p =>
      var sumAbs = 0L
      var peak = 0
      var zc = 0L
      var prev = 0
      var i = 0
      while (i < p.samples.length) {
        val s = p.samples(i)
        val a = math.abs(s)
        sumAbs += a
        if (a > peak) peak = a
        if (i > 0 && ((s < 0) != (prev < 0))) zc += 1
        prev = s
        i += 1
      }
      (p.sampleRate, p.samples.length.toLong, sumAbs, peak, zc)
    }

  /** The `media_flac` fixture family: SAME deterministic PCM formula
    * as [[Multimodal.FixtureWav]] (`((id % 100003) * 131 + i * 7919) %
    * 65536 - 32768`, `200 + id % 601` samples at 8 kHz) — the oracle
    * replays one arithmetic text for both audio legs — encoded with a
    * rotating subframe strategy so verbatim, fixed prediction AND real
    * LPC subframes all run in production. */
  object FixtureFlac {
    def bytes(id: Long): Array[Byte] = {
      val n = Multimodal.FixtureWav.nSamples(id)
      val s = Array.tabulate(n)(i =>
        Multimodal.FixtureWav.sample(id, i.toLong).toInt)
      val strat: Strategy = (id % 4) match {
        case 0 => Verbatim
        case 1 => Fixed(1)
        case 2 => Fixed(2)
        case _ => Lpc(2, 4)
      }
      encode(Multimodal.FixtureWav.SampleRate, 1, s, strat)
    }
  }
}
