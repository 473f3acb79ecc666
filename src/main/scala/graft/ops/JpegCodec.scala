package graft.ops

/** FROM-SCRATCH JPEG (ITU-T T.81 / JFIF) decoder — the last dominant
  * training-image format behind the repo's codec seam implemented for
  * real (PNG/GIF/WAV/MP4 already are; see [[Multimodal]]). Baseline
  * sequential AND progressive DCT, 8-bit precision:
  *
  *  - marker segments: SOI / APPn / COM / DQT (8- and 16-bit tables) /
  *    SOF0 / SOF1 / SOF2 / DHT / DRI / SOS / RSTn / EOI;
  *  - canonical Huffman decode of DC (differential, per-component
  *    predictor) and AC (run/size with ZRL and EOB) coefficients, with
  *    0xFF00 byte-unstuffing and restart-interval resync;
  *  - PROGRESSIVE (SOF2, T.81 Annex G): multi-scan coefficient
  *    accumulation — spectral selection bands, successive-approximation
  *    first + refinement passes for both DC and AC, cross-block EOB
  *    runs with correction bits, interleaved DC / non-interleaved AC
  *    scan geometry, per-scan restart resync ([[ProgState]]);
  *  - dequantization in zig-zag order, separable floating-point 2-D
  *    IDCT (exact for the integer inputs the tests pin), +128 level
  *    shift, round + clamp;
  *  - grayscale (1 component) and YCbCr (3 components) with sampling
  *    factors 1–2 on either axis (4:4:4 / 4:2:2 / 4:2:0), box
  *    replication upsampling, BT.601 YCbCr→RGB.
  *
  * Arithmetic coding, lossless/hierarchical, 12-bit precision, and
  * CMYK refuse loudly (`None`) — callers fall through to
  * `javax.imageio` or the stub seam, never to silently wrong pixels.
  * The decoder is spec-pinned against `javax.imageio`'s
  * libjpeg-derived reader (JpegCodecSpec): identical dims everywhere,
  * pixel-exact within the IDCT tolerance the JPEG standard itself
  * allows — including on imageio's own multi-scan progressive writer
  * output.
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
    var progressive = false
    var prog: ProgState = null

    def u16(p: Int): Int = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)

    while (pos < bytes.length) {
      if ((bytes(pos) & 0xFF) != 0xFF)
        throw new JpegFormatException(s"expected marker at $pos")
      var marker = bytes(pos + 1) & 0xFF
      while (marker == 0xFF) { pos += 1; marker = bytes(pos + 1) & 0xFF }
      pos += 2
      marker match {
        case 0xD9 => // EOI: a progressive frame finishes HERE (multi-scan)
          return if (prog != null) Some(prog.finish()) else None
        case 0xC0 | 0xC1 | 0xC2 => // C1 = extended sequential (same scan
          // shape); C2 = progressive (spectral selection + successive
          // approximation, multi-scan coefficient accumulation)
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
          progressive = marker == 0xC2
          pos += len
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
             0xCD | 0xCE | 0xCF =>
          return None // lossless / arithmetic / hierarchical
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
        case 0xDA => // SOS — baseline: the one interleaved scan;
          // progressive: one of many partial-coefficient scans
          if (comps == null) throw new JpegFormatException("SOS before SOF")
          val len = u16(pos)
          val ns = bytes(pos + 2) & 0xFF
          if (!progressive && ns != comps.length)
            throw new JpegFormatException("non-interleaved scan")
          var p = pos + 3
          val scanComps = new Array[Component](ns)
          var i = 0
          while (i < ns) {
            val cid = bytes(p) & 0xFF
            val tt = bytes(p + 1) & 0xFF
            val c = comps.find(_.id == cid).getOrElse(
              throw new JpegFormatException(s"unknown scan component $cid"))
            c.dcTab = (tt >> 4) & 0xF
            c.acTab = tt & 0xF
            scanComps(i) = c
            p += 2
            i += 1
          }
          val ss = bytes(p) & 0xFF
          val se = bytes(p + 1) & 0xFF
          val ahal = bytes(p + 2) & 0xFF
          pos += len
          if (!progressive)
            return Some(decodeScan(bytes, pos, comps, qtabs, dcTabs, acTabs,
              width, height, restartInterval))
          if (prog == null) prog = new ProgState(comps, qtabs, width, height)
          pos = prog.decodeScan(bytes, pos, scanComps, dcTabs, acTabs,
            ss, se, (ahal >> 4) & 0xF, ahal & 0xF, restartInterval)
        case m if m >= 0xD0 && m <= 0xD7 => // stray RST outside scan
          ()
        case _ => // APPn / COM / others: length-prefixed skip
          pos += u16(pos)
      }
    }
    // stream ended without EOI: refuse — T.81 mandates the EOI, and a
    // TRUNCATED multi-scan progressive would otherwise render partial
    // pixels that silently disagree with a full decode
    None
  }

  /** PROGRESSIVE (SOF2) frame state — T.81 Annex G: coefficients
    * accumulate across scans (spectral selection picks a zig-zag band,
    * successive approximation delivers magnitude bits high-to-low) into
    * per-component MCU-padded block grids; dequantization + IDCT run
    * ONCE at EOI. DC scans may interleave any component subset
    * (per-component differential predictors, reset per scan and at
    * RSTn); AC scans are single-component by the standard, iterated
    * over the component's OWN block raster; EOB runs
    * ([[https://www.w3.org/Graphics/JPEG/itu-t81.pdf T.81 G.1.2.2]])
    * span blocks and carry correction bits in refinement scans. */
  private final class ProgState(comps: Array[Component],
                                qtabs: Array[Array[Int]],
                                width: Int, height: Int) {
    private val hMax = comps.map(_.h).max
    private val vMax = comps.map(_.v).max
    private val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    private val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    private val blocksW = comps.map(c => mcusX * c.h)
    private val blocksH = comps.map(c => mcusY * c.v)
    // per component: MCU-padded grid of 64-int blocks, ZIG-ZAG positions
    // resolved to NATURAL order at write time (like the baseline path)
    private val coefs: Array[Array[Int]] = comps.indices.map(i =>
      new Array[Int](blocksW(i) * blocksH(i) * 64)).toArray
    private def idxOf(c: Component): Int = comps.indexWhere(_.id == c.id)

    def decodeScan(bytes: Array[Byte], start: Int,
                   scanComps: Array[Component],
                   dcTabs: Array[Huff], acTabs: Array[Huff],
                   ss: Int, se: Int, ah: Int, al: Int,
                   restartInterval: Int): Int = {
      if (ss > se || se > 63)
        throw new JpegFormatException(s"bad spectral band $ss..$se")
      if (ss > 0 && scanComps.length != 1)
        throw new JpegFormatException("interleaved AC scan")
      val in = new BitReader(bytes, start)
      var eobrun = 0
      var nextRst = 0
      scanComps.foreach(_.pred = 0)

      def dcFirst(c: Component, arr: Array[Int], off: Int): Unit = {
        val dcT = dcTabs(c.dcTab)
        if (dcT == null) throw new JpegFormatException("missing DC table")
        val s = dcT.decode(in)
        c.pred += in.extend(in.receive(s), s)
        arr(off) = c.pred << al
      }
      def dcRefine(arr: Array[Int], off: Int): Unit =
        if (in.bit() == 1) arr(off) |= (1 << al)
      def acFirst(c: Component, arr: Array[Int], off: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        val acT = acTabs(c.acTab)
        if (acT == null) throw new JpegFormatException("missing AC table")
        var k = ss
        while (k <= se) {
          val rs = acT.decode(in)
          val r = (rs >> 4) & 0xF
          val s = rs & 0xF
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else { // EOBn: this block ends; r more magnitude bits follow
              eobrun = (1 << r) - 1 + (if (r > 0) in.receive(r) else 0)
              return
            }
          } else {
            k += r
            if (k > se) throw new JpegFormatException("AC run overflow")
            arr(off + ZigZag(k)) = in.extend(in.receive(s), s) << al
            k += 1
          }
        }
      }
      /** T.81 G.1.2.3 (the libjpeg-shaped control flow): newly-nonzero
        * coefficients arrive as +-1<<al; every already-nonzero
        * coefficient CROSSED carries one correction bit. */
      def acRefine(c: Component, arr: Array[Int], off: Int): Unit = {
        val acT = acTabs(c.acTab)
        if (acT == null) throw new JpegFormatException("missing AC table")
        val p1 = 1 << al
        val m1 = -1 << al
        def correct(pos0: Int): Unit =
          if (in.bit() == 1 && (arr(pos0) & p1) == 0)
            arr(pos0) += (if (arr(pos0) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var ended = false
          while (k <= se && !ended) {
            val rs = acT.decode(in)
            var r = (rs >> 4) & 0xF
            val s = rs & 0xF
            var newVal = 0
            if (s != 0) {
              if (s != 1)
                throw new JpegFormatException("refinement size != 1")
              newVal = if (in.bit() == 1) p1 else m1
            } else if (r != 15) { // EOBn (r==15 = ZRL: 16 zero-history)
              eobrun = (1 << r) + (if (r > 0) in.receive(r) else 0)
              ended = true
            }
            if (!ended) {
              // advance over r ZERO-history positions, correcting every
              // nonzero one crossed; stop on the r+1-th zero (newVal's)
              var placed = false
              while (k <= se && !placed) {
                val pos0 = off + ZigZag(k)
                if (arr(pos0) != 0) { correct(pos0); k += 1 }
                else if (r == 0) {
                  if (newVal != 0) arr(pos0) = newVal
                  placed = true
                } else { r -= 1; k += 1 }
              }
              if (!placed && newVal != 0)
                throw new JpegFormatException("refinement run overflow")
              k += 1
            }
          }
        }
        if (eobrun > 0) { // band tail of an EOB-run block: corrections only
          while (k <= se) {
            val pos0 = off + ZigZag(k)
            if (arr(pos0) != 0) correct(pos0)
            k += 1
          }
          eobrun -= 1
        }
      }

      def decodeBlockAt(c: Component, arr: Array[Int], off: Int): Unit =
        if (ss == 0) {
          if (ah == 0) dcFirst(c, arr, off) else dcRefine(arr, off)
          if (se != 0) throw new JpegFormatException("DC scan with Se>0")
        } else {
          if (ah == 0) acFirst(c, arr, off) else acRefine(c, arr, off)
        }

      def resync(mcuIdx: Int): Unit =
        if (restartInterval > 0 && mcuIdx > 0 &&
            mcuIdx % restartInterval == 0) {
          in.alignToByte()
          var p = in.pos
          while (p + 1 < bytes.length &&
              !((bytes(p) & 0xFF) == 0xFF && (bytes(p + 1) & 0xFF) != 0x00))
            p += (if ((bytes(p) & 0xFF) == 0xFF) 2 else 1)
          while (p + 1 < bytes.length && (bytes(p + 1) & 0xFF) == 0xFF)
            p += 1
          val m = bytes(p + 1) & 0xFF
          if (m != (0xD0 | nextRst))
            throw new JpegFormatException(f"expected RST$nextRst%d, got $m%02x")
          in.pos = p + 2
          nextRst = (nextRst + 1) & 7
          scanComps.foreach(_.pred = 0)
          eobrun = 0
        }

      if (scanComps.length == 1) {
        // non-interleaved: the component's OWN block raster (T.81
        // A.2.2) — its count may be smaller than the padded grid
        val c = scanComps(0)
        val ci = idxOf(c)
        val arr = coefs(ci)
        val bw = (((width * c.h + hMax - 1) / hMax) + 7) / 8
        val bh = (((height * c.v + vMax - 1) / vMax) + 7) / 8
        var mcu = 0
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            resync(mcu)
            decodeBlockAt(c, arr, (by * blocksW(ci) + bx) * 64)
            mcu += 1
            bx += 1
          }
          by += 1
        }
      } else {
        // interleaved (DC scans): frame MCU geometry, scan components
        var mcu = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            resync(mcu)
            var i = 0
            while (i < scanComps.length) {
              val c = scanComps(i)
              val ci = idxOf(c)
              var v = 0
              while (v < c.v) {
                var h = 0
                while (h < c.h) {
                  decodeBlockAt(c, coefs(ci),
                    ((my * c.v + v) * blocksW(ci) + (mx * c.h + h)) * 64)
                  h += 1
                }
                v += 1
              }
              i += 1
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      }
      // park past the scan's entropy bytes: skip stuffed FF00 and any
      // RSTn, stop at the next real marker
      in.alignToByte()
      var p = in.pos
      while (p + 1 < bytes.length && {
        val b0 = bytes(p) & 0xFF
        if (b0 != 0xFF) { p += 1; true }
        else {
          val b1 = bytes(p + 1) & 0xFF
          if (b1 == 0x00 || b1 == 0xFF) { p += (if (b1 == 0x00) 2 else 1); true }
          else if (b1 >= 0xD0 && b1 <= 0xD7) { p += 2; true }
          else false
        }
      }) ()
      p
    }

    /** Dequantize + IDCT every accumulated block, then the shared crop/
      * upsample/color assembly. */
    def finish(): Raster = {
      val planeW = comps.map(c => mcusX * 8 * c.h)
      val planes = comps.indices.map(i =>
        new Array[Byte](planeW(i) * (mcusY * 8 * comps(i).v))).toArray
      val deq = new Array[Int](64)
      val out = new Array[Double](64)
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qtabs(c.tq)
        if (q == null) throw new JpegFormatException("missing quant table")
        val arr = coefs(ci)
        var by = 0
        while (by < blocksH(ci)) {
          var bx = 0
          while (bx < blocksW(ci)) {
            val off = (by * blocksW(ci) + bx) * 64
            var i = 0
            while (i < 64) { deq(i) = arr(off + i) * q(i); i += 1 }
            idctStore(deq, out, planes(ci), planeW(ci), bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      assemble(comps, planes, planeW, hMax, vMax, width, height)
    }
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
      idctStore(coef, out, plane, pw, px, py)
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

    assemble(comps, planes, planeW, hMax, vMax, width, height)
  }

  /** Separable IDCT (rows x columns with the 1/2 C(u) factors) of one
    * DEQUANTIZED natural-order block, +128 level shift, round + clamp,
    * stored into the component plane at (px, py). */
  private def idctStore(coef: Array[Int], out: Array[Double],
                        plane: Array[Byte], pw: Int,
                        px: Int, py: Int): Unit = {
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

  /** Crop to (width, height); box-replication upsampling of subsampled
    * chroma; BT.601 YCbCr -> RGB for 3 components. Shared by the
    * baseline one-scan path and the progressive finish. */
  private def assemble(comps: Array[Component], planes: Array[Array[Byte]],
                       planeW: Array[Int], hMax: Int, vMax: Int,
                       width: Int, height: Int): Raster = {
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

  /** Encode the SAME grayscale DC-only image as a PROGRESSIVE (SOF2)
    * three-scan stream: DC-first at Al=1 (high magnitude bits,
    * differential), an all-EOB AC-first scan (band 1..63 — every
    * coefficient band must appear in some scan for strict readers),
    * and a DC refinement delivering the Al=0 bit raw. Pixels are
    * IDENTICAL to [[encodeGrayDcOnly]]'s for the same `blockVal` —
    * the arithmetic-oracle property carries over to the progressive
    * path. `restartInterval` (per scan, MCU = one block) exercises
    * RSTn resync + per-scan predictor/EOB-run resets. */
  def encodeGrayDcOnlyProgressive(w: Int, h: Int, blockVal: Int => Int,
                                  restartInterval: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dims must be multiples of 8")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    out.write(0xFF); out.write(0xD8) // SOI
    if (restartInterval > 0) {
      out.write(0xFF); out.write(0xDD); u16(4); u16(restartInterval)
    }
    out.write(0xFF); out.write(0xDB); u16(2 + 1 + 64); out.write(0x00)
    var i = 0
    while (i < 64) { out.write(if (i == 0) 8 else 16); i += 1 }
    // SOF2: 8-bit, 1 component, 1x1 sampling, qtable 0
    out.write(0xFF); out.write(0xC2); u16(2 + 6 + 3)
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    def dht(tc: Int, counts: Array[Int], symbols: Array[Int]): Unit = {
      out.write(0xFF); out.write(0xC4); u16(2 + 1 + 16 + symbols.length)
      out.write((tc << 4) | 0)
      counts.foreach(out.write)
      symbols.foreach(out.write)
    }
    dht(0, StdDcCounts, StdDcSymbols)
    dht(1, StdAcCounts, StdAcSymbols)
    val dcCodes = codesOf(StdDcCounts, StdDcSymbols)
    val acCodes = codesOf(StdAcCounts, StdAcSymbols)
    val nBlocks = (w / 8) * (h / 8)
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      out.write(0xFF); out.write(0xDA); u16(2 + 1 + 2 + 3)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    var pred = 0
    /** One scan's entropy data: per block `emit(bw, b)`, with RSTn
      * every `restartInterval` blocks (fresh bit stream after each). */
    def scanBody(emit: (BitWriter, Int) => Unit): Unit = {
      var bw = new BitWriter(out)
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
        emit(bw, b)
        b += 1
      }
      bw.flushWithOnes()
    }
    // scan 1: DC first, Al=1 — differential (v >> 1), size/extend coded
    sos(0, 0, 0, 1)
    pred = 0
    scanBody { (bw, b) =>
      val v = blockVal(b)
      require(v >= -128 && v <= 127, s"blockVal out of range: $v")
      val hi = v >> 1 // arithmetic shift: (hi << 1) | (v & 1) == v
      val diff = hi - pred
      pred = hi
      val size = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(
        math.abs(diff))
      val (c, l) = dcCodes(size)
      bw.put(c, l)
      if (size > 0) {
        val bits = if (diff < 0) diff + (1 << size) - 1 else diff
        bw.put(bits, size)
      }
    }
    // scan 2: AC first, band 1..63, Al=0 — every block is one EOB0
    val (eobCode, eobLen) = acCodes(0x00)
    sos(1, 63, 0, 0)
    scanBody { (bw, _) => bw.put(eobCode, eobLen) }
    // scan 3: DC refinement, Al=0 — the low magnitude bit, raw
    sos(0, 0, 1, 0)
    scanBody { (bw, b) => bw.put(blockVal(b) & 1, 1) }
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** The `media_jpeg_features` fixture family: per doc, a DC-only
    * grayscale JPEG whose block pixels follow the arithmetic formula
    * the DuckDB oracle replays
    * (`((id % 100003) * 31 + b * 7) % 256` per 8x8 block `b`). Every
    * THIRD doc encodes PROGRESSIVE (SOF2, three scans — the spectral-
    * selection + successive-approximation path runs in production);
    * every fifth carries a restart interval so RSTn resync runs in
    * both frame types. */
  object FixtureJpeg {
    def dims(id: Long): (Int, Int) =
      ((8 * (1 + id % 4)).toInt, (8 * (1 + id % 3)).toInt)
    def blockPixel(id: Long, b: Int): Int =
      (((id % 100003) * 31 + b * 7) % 256).toInt
    def bytes(id: Long): Array[Byte] = {
      val (w, h) = dims(id)
      val rst = if (id % 5 == 0) 2 else 0
      if (id % 3 == 0)
        encodeGrayDcOnlyProgressive(w, h, b => blockPixel(id, b) - 128,
          restartInterval = rst)
      else
        encodeGrayDcOnly(w, h, b => blockPixel(id, b) - 128,
          restartInterval = rst)
    }
  }
}
