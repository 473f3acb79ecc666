package graft.ops

/** FROM-SCRATCH baseline JPEG (ITU-T T.81 / JFIF) decoder — the last
  * dominant training-image format behind the repo's codec seam
  * implemented for real (PNG/GIF/WAV/MP4 already are; see
  * [[Multimodal]]). Baseline sequential DCT, 8-bit precision:
  *
  *  - marker segments: SOI / APPn / COM / DQT (8- and 16-bit tables) /
  *    SOF0 / DHT / DRI / SOS / RSTn / EOI;
  *  - canonical Huffman decode of DC (differential, per-component
  *    predictor) and AC (run/size with ZRL and EOB) coefficients, with
  *    0xFF00 byte-unstuffing and restart-interval resync;
  *  - dequantization in zig-zag order, separable floating-point 2-D
  *    IDCT (exact for the integer inputs the tests pin), +128 level
  *    shift, round + clamp;
  *  - grayscale (1 component) and YCbCr (3 components) with sampling
  *    factors 1–2 on either axis (4:4:4 / 4:2:2 / 4:2:0), box
  *    replication upsampling, BT.601 YCbCr→RGB.
  *
  * Progressive (SOF2), arithmetic coding, 12-bit precision, and CMYK
  * refuse loudly (`None`) — callers fall through to `javax.imageio`
  * or the stub seam, never to silently wrong pixels. The decoder is
  * spec-pinned against `javax.imageio`'s libjpeg-derived reader
  * (JpegCodecSpec): identical dims everywhere, pixel-exact within the
  * IDCT tolerance the JPEG standard itself allows.
  *
  * Scale note: decode is per-payload pure CPU — the pipeline drives it
  * partition-wise ([[Multimodal.jpegFeatures]]), one codec instance
  * per partition, no driver involvement; linear in bytes at any scale. */
object JpegCodec {

  /** Decoded raster: `channels` ∈ {1, 3}; `data` row-major, interleaved
    * (gray, or R,G,B), unsigned bytes. */
  final case class Raster(width: Int, height: Int, channels: Int,
                          data: Array[Byte])

  // ---- zig-zag order (T.81 Figure A.6) -----------------------------
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code assignment (T.81 Annex C): per length, first code
    // and symbol-index base — decode walks bit by bit
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17) // -1 = no codes this length
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = in.bit()
      var l = 1
      while (l <= 16) {
        if (maxCode(l) >= 0 && code <= maxCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        code = (code << 1) | in.bit()
        l += 1
      }
      throw new JpegFormatException("invalid Huffman code")
    }
  }

  private final class JpegFormatException(msg: String)
      extends RuntimeException(msg)

  /** Entropy-coded-segment bit reader: MSB-first, 0xFF00 unstuffed; a
    * bare 0xFFxx marker ends the segment (position parks ON the 0xFF). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length)
          throw new JpegFormatException("EOF in entropy data")
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          val next = if (pos < bytes.length) bytes(pos) & 0xFF else -1
          if (next == 0x00) pos += 1 // stuffed FF
          else { // marker: back up and feed zeros (T.81 padding rule)
            pos -= 1
            b = 0
          }
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** DIFF/coefficient sign extension (T.81 F.2.2.1 EXTEND). */
    def extend(v: Int, n: Int): Int =
      if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
    def alignToByte(): Unit = nbits = 0
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int,
                                     var dcTab: Int = 0, var acTab: Int = 0,
                                     var pred: Int = 0)

  /** Decode baseline JPEG bytes; `None` when the payload is not a JPEG
    * this decoder speaks (wrong magic, progressive, 12-bit, CMYK,
    * malformed stream) — callers fall through, never get wrong pixels. */
  def decode(bytes: Array[Byte]): Option[Raster] =
    try decodeStrict(bytes)
    catch {
      case _: JpegFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  private def decodeStrict(bytes: Array[Byte]): Option[Raster] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var pos = 2
    val qtabs = new Array[Array[Int]](4) // natural order
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0

    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)

    while (pos < bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF)
        throw new JpegFormatException(s"expected marker at $pos")
      var marker = bytes(pos + 1) & 0xFF
      while (marker == 0xFF) { pos += 1; marker = bytes(pos + 1) & 0xFF }
      pos += 2
      marker match {
        case 0xD9 => return None // EOI before SOS produced pixels
        case 0xC0 | 0xC1 => // baseline (C1 = extended sequential, same scan shape)
          val len = u16(pos)
          val prec = bytes(pos + 2) & 0xFF
          if (prec != 8) return None // 12-bit out of scope
          height = u16(pos + 3)
          width = u16(pos + 5)
          val n = bytes(pos + 7) & 0xFF
          if (n != 1 && n != 3) return None // CMYK etc out of scope
          comps = Array.tabulate(n) { i =>
            val o = pos + 8 + i * 3
            val hv = bytes(o + 1) & 0xFF
            val c = Component(bytes(o) & 0xFF, (hv >> 4) & 0xF, hv & 0xF,
              bytes(o + 2) & 0xFF)
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2) return None
            c
          }
          pos += len
        case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
             0xCD | 0xCE | 0xCF =>
          return None // progressive / arithmetic / hierarchical
        case 0xC4 => // DHT
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val tc = (bytes(p) >> 4) & 0xF
            val th = bytes(p) & 0xF
            p += 1
            val counts = Array.tabulate(16)(i => bytes(p + i) & 0xFF)
            p += 16
            val total = counts.sum
            val symbols = Array.tabulate(total)(i => bytes(p + i) & 0xFF)
            p += total
            val h = new Huff(counts, symbols)
            if (tc == 0) dcTabs(th) = h else acTabs(th) = h
          }
          pos += len
        case 0xDB => // DQT
          val len = u16(pos)
          var p = pos + 2
          while (p < pos + len) {
            val pq = (bytes(p) >> 4) & 0xF
            val tq = bytes(p) & 0xF
            p += 1
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              val v = if (pq == 0) bytes(p) & 0xFF else u16(p)
              p += (if (pq == 0) 1 else 2)
              t(ZigZag(i)) = v
              i += 1
            }
            qtabs(tq) = t
          }
          pos += len
        case 0xDD => // DRI
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xDA => // SOS — baseline: the one interleaved scan
          if (comps == null) throw new JpegFormatException("SOS before SOF")
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xFF
          if (ns != comps.length)
            throw new JpegFormatException("non-interleaved scan")
          var p = pos + 3
          var i = 0
          while (i < ns) {
            val cid = bytes(p) & 0xFF
            val tt = bytes(p + 1) & 0xFF
            val c = comps.find(_.id == cid).getOrElse(
              throw new JpegFormatException(s"unknown scan component $cid"))
            c.dcTab = (tt >> 4) & 0xF
            c.acTab = tt & 0xF
            p += 2
            i += 1
          }
          pos += len
          return Some(decodeScan(bytes, pos, comps, qtabs, dcTabs, acTabs,
            width, height, restartInterval))
        case m if m >= 0xD0 && m <= 0xD7 => // stray RST outside scan
          ()
        case _ => // APPn / COM / others: length-prefixed skip
          pos += u16(pos)
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], start: Int,
                         comps: Array[Component], qtabs: Array[Array[Int]],
                         dcTabs: Array[Huff], acTabs: Array[Huff],
                         width: Int, height: Int,
                         restartInterval: Int): Raster = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component plane at ITS sampling resolution, MCU-padded
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray
    val in = new BitReader(bytes, start)
    val coef = new Array[Int](64)
    val out = new Array[Double](64)
    var nextRst = 0

    def decodeBlock(c: Component, plane: Array[Byte], pw: Int,
                    px: Int, py: Int): Unit = {
      val q = qtabs(c.tq)
      if (q == null) throw new JpegFormatException("missing quant table")
      val dcT = dcTabs(c.dcTab)
      val acT = acTabs(c.acTab)
      if (dcT == null || acT == null)
        throw new JpegFormatException("missing Huffman table")
      java.util.Arrays.fill(coef, 0)
      val s = dcT.decode(in)
      val diff = in.extend(in.receive(s), s)
      c.pred += diff
      coef(0) = c.pred * q(0)
      var k = 1
      while (k < 64) {
        val rs = acT.decode(in)
        val r = (rs >> 4) & 0xF
        val size = rs & 0xF
        if (size == 0) {
          if (r == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += r
          if (k > 63) throw new JpegFormatException("AC run overflow")
          val nat = ZigZag(k)
          coef(nat) = in.extend(in.receive(size), size) * q(nat)
          k += 1
        }
      }
      // separable IDCT: rows then columns, with the 1/2 C(u) factors
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var sum = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            val cy = CosTable(y * 8 + v) * (if (v == 0) 0.70710678118654752 else 1.0)
            while (u < 8) {
              val cu = if (u == 0) 0.70710678118654752 else 1.0
              sum += cu * cy * coef(v * 8 + u) * CosTable(x * 8 + u)
              u += 1
            }
            v += 1
          }
          out(y * 8 + x) = sum / 4.0
          x += 1
        }
        y += 1
      }
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          val v = math.round(out(yy * 8 + xx) + 128.0).toInt
          val clamped = if (v < 0) 0 else if (v > 255) 255 else v
          plane((py + yy) * pw + (px + xx)) = clamped.toByte
          xx += 1
        }
        yy += 1
      }
    }

    var my = 0
    var mcuIdx = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 &&
            mcuIdx % restartInterval == 0) {
          // resync: align, scan to the marker (skipping stuffed FF00
          // pairs and FF fill bytes), consume RSTn, reset predictors
          in.alignToByte()
          var p = in.pos
          while (p + 1 < bytes.length &&
              !((bytes(p) & 0xFF) == 0xFF && (bytes(p + 1) & 0xFF) != 0x00))
            p += (if ((bytes(p) & 0xFF) == 0xFF) 2 else 1) // FF00 = data
          while (p + 1 < bytes.length && (bytes(p + 1) & 0xFF) == 0xFF)
            p += 1 // fill bytes
          val m = bytes(p + 1) & 0xFF
          if (m != (0xD0 | nextRst))
            throw new JpegFormatException(f"expected RST$nextRst%d, got $m%02x")
          in.pos = p + 2
          nextRst = (nextRst + 1) & 7
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var v = 0
          while (v < c.v) {
            var h = 0
            while (h < c.h) {
              decodeBlock(c, planes(ci), planeW(ci),
                (mx * c.h + h) * 8, (my * c.v + v) * 8)
              h += 1
            }
            v += 1
          }
          ci += 1
        }
        mcuIdx += 1
        mx += 1
      }
      my += 1
    }

    // assemble: crop to (width, height); box-replication upsampling of
    // subsampled chroma; BT.601 YCbCr -> RGB for 3 components
    if (comps.length == 1) {
      val data = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, data, y * width, width)
        y += 1
      }
      Raster(width, height, 1, data)
    } else {
      val data = new Array[Byte](width * height * 3)
      val py = planes(0); val pb = planes(1); val pr = planes(2)
      val c0 = comps(0); val c1 = comps(1); val c2 = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val lum = py((y * c0.v / vMax) * planeW(0) + x * c0.h / hMax) & 0xFF
          val cb = (pb((y * c1.v / vMax) * planeW(1) + x * c1.h / hMax) & 0xFF) - 128
          val cr = (pr((y * c2.v / vMax) * planeW(2) + x * c2.h / hMax) & 0xFF) - 128
          val r = math.round(lum + 1.402 * cr).toInt
          val g = math.round(lum - 0.344136 * cb - 0.714136 * cr).toInt
          val b = math.round(lum + 1.772 * cb).toInt
          val o = (y * width + x) * 3
          data(o) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          data(o + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          data(o + 2) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
          x += 1
        }
        y += 1
      }
      Raster(width, height, 3, data)
    }
  }

  /** Exact integer pixel stats off a decoded raster — RAW samples
    * (gray folds into all three channel sums; no color management,
    * unlike BufferedImage.getRGB's linear-gray→sRGB view). */
  def decodeStats(bytes: Array[Byte])
      : Option[Multimodal.ImageIoCodec.ImageStats] =
    decode(bytes).map { r =>
      var sr = 0L; var sg = 0L; var sb = 0L
      if (r.channels == 1) {
        var i = 0
        while (i < r.data.length) {
          val v = (r.data(i) & 0xFF).toLong
          sr += v; sg += v; sb += v
          i += 1
        }
      } else {
        var i = 0
        while (i < r.data.length) {
          sr += r.data(i) & 0xFF
          sg += r.data(i + 1) & 0xFF
          sb += r.data(i + 2) & 0xFF
          i += 3
        }
      }
      Multimodal.ImageIoCodec.ImageStats(r.width, r.height, r.channels,
        sr, sg, sb)
    }

  // ==== fixture ENCODER (tests + oracle queries) ======================

  /** Standard luminance Huffman tables (T.81 Annex K.3) — public-spec
    * constants, the ones every JFIF writer ships. */
  private val StdDcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcSymbols = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val StdAcCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val StdAcSymbols = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // stuff
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (nbits > 0) { put(0x7F, 8 - nbits); () }
  }

  /** Canonical (code,length) per symbol for a counts/symbols table. */
  private def codesOf(counts: Array[Int], symbols: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) {
        m += symbols(k) -> ((code, l))
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    m.result()
  }

  /** Encode a GRAYSCALE, DC-ONLY baseline JPEG: every 8x8 block a flat
    * `blockVal(bi) + 128` (blockVal in -128..127), quant table with
    * Q(0,0) = 8 so dequant x IDCT reproduces the block value EXACTLY —
    * the co-designed fixture an arithmetic oracle can replay while the
    * whole marker/Huffman/bit path stays the real format. `w`/`h` must
    * be multiples of 8. */
  def encodeGrayDcOnly(w: Int, h: Int, blockVal: Int => Int,
                       restartInterval: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dims must be multiples of 8")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    out.write(0xFF); out.write(0xD8) // SOI
    if (restartInterval > 0) { // DRI
      out.write(0xFF); out.write(0xDD); u16(4); u16(restartInterval)
    }
    // DQT: 8-bit table 0, Q(0,0)=8 (exact DC), rest 16 (unused: AC=0)
    out.write(0xFF); out.write(0xDB); u16(2 + 1 + 64); out.write(0x00)
    var i = 0
    while (i < 64) { out.write(if (i == 0) 8 else 16); i += 1 }
    // SOF0: 8-bit, 1 component, 1x1 sampling, qtable 0
    out.write(0xFF); out.write(0xC0); u16(2 + 6 + 3)
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // DHT: std DC + AC luminance
    def dht(tc: Int, counts: Array[Int], symbols: Array[Int]): Unit = {
      out.write(0xFF); out.write(0xC4); u16(2 + 1 + 16 + symbols.length)
      out.write((tc << 4) | 0)
      counts.foreach(out.write)
      symbols.foreach(out.write)
    }
    dht(0, StdDcCounts, StdDcSymbols)
    dht(1, StdAcCounts, StdAcSymbols)
    // SOS
    out.write(0xFF); out.write(0xDA); u16(2 + 1 + 2 + 3)
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // entropy data: per block, DC diff + EOB
    val dcCodes = codesOf(StdDcCounts, StdDcSymbols)
    val acCodes = codesOf(StdAcCounts, StdAcSymbols)
    val (eobCode, eobLen) = acCodes(0x00)
    var bw = new BitWriter(out)
    val nBlocks = (w / 8) * (h / 8)
    var pred = 0
    var rstN = 0
    var b = 0
    while (b < nBlocks) {
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        bw.flushWithOnes()
        out.write(0xFF); out.write(0xD0 | rstN)
        rstN = (rstN + 1) & 7
        pred = 0
        bw = new BitWriter(out)
      }
      val v = blockVal(b)
      require(v >= -128 && v <= 127, s"blockVal out of range: $v")
      val diff = v - pred
      pred = v
      // size/extend encoding of the diff (T.81 F.1.2.1)
      val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(
        math.abs(diff))
      val (c, l) = dcCodes(size)
      bw.put(c, l)
      if (size > 0) {
        val bits = if (diff < 0) diff + (1 << size) - 1 else diff
        bw.put(bits, size)
      }
      bw.put(eobCode, eobLen)
      b += 1
    }
    bw.flushWithOnes()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** The `media_jpeg_features` fixture family: per doc, a DC-only
    * grayscale baseline JPEG whose block pixels follow the arithmetic
    * formula the DuckDB oracle replays
    * (`((id % 100003) * 31 + b * 7) % 256` per 8x8 block `b`); every
    * fifth doc carries a restart interval so the RSTn resync path runs
    * in production, not just in specs. */
  object FixtureJpeg {
    def dims(id: Long): (Int, Int) =
      ((8 * (1 + id % 4)).toInt, (8 * (1 + id % 3)).toInt)
    def blockPixel(id: Long, b: Int): Int =
      (((id % 100003) * 31 + b * 7) % 256).toInt
    def bytes(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      encodeGrayDcOnly(w, h, b => blockPixel(id, b) - 128,
        restartInterval = if (id % 5 == 0) 2 else 0)
    }
  }
}
