package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch baseline JPEG decoder vs `javax.imageio`'s
  * libjpeg-derived reader: identical dims everywhere; pixel-exact on
  * the co-designed DC-only fixtures; within the JPEG standard's IDCT
  * tolerance on real writer output; loud refusal on progressive. */
class JpegCodecSpec extends AnyFunSuite {

  private def imageioDecode(bytes: Array[Byte]): BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def writeJpeg(img: BufferedImage, quality: Float,
                        progressive: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    out.toByteArray
  }

  test("DC-only gray fixture: pixel-exact, and imageio agrees the bytes are legal JPEG") {
    for (id <- Seq(1L, 7L, 42L, 100002L, 999983L)) {
      val (w, h) = ((8 * (1 + id % 4)).toInt, (8 * (1 + id % 3)).toInt)
      def pix(b: Int): Int = (((id % 100003) * 31 + b * 7) % 256).toInt
      val bytes = JpegCodec.encodeGrayDcOnly(w, h, b => pix(b) - 128)
      val r = JpegCodec.decode(bytes).getOrElse(fail(s"decode failed id=$id"))
      assert(r.width === w && r.height === h && r.channels === 1)
      val bw = w / 8
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y / 8) * bw + (x / 8)
        assert((r.data(y * w + x) & 0xFF) === pix(b),
          s"id=$id pixel ($x,$y) block $b")
      }
      // the fixture is REAL JPEG: the JDK reader decodes the same RAW
      // samples (getRGB would gamma-map linear gray to sRGB — compare
      // raster samples, not the color-managed view)
      val img = imageioDecode(bytes)
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) ===
          pix((y / 8) * bw + (x / 8)))
    }
  }

  test("restart markers: DRI/RSTn resync decodes identically") {
    val id = 65537L
    val (w, h) = (32, 24)
    def pix(b: Int): Int = ((id * 31 + b * 7) % 256).toInt
    val plain = JpegCodec.encodeGrayDcOnly(w, h, b => pix(b) - 128)
    val rst = JpegCodec.encodeGrayDcOnly(w, h, b => pix(b) - 128,
      restartInterval = 2)
    assert(rst.length > plain.length, "RST markers must be present")
    val a = JpegCodec.decode(plain).get
    val b = JpegCodec.decode(rst).get
    assert(a.data.toSeq === b.data.toSeq)
    // imageio agrees on the restart-marked stream too (raw samples)
    val img = imageioDecode(rst)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === (b.data(y * w + x) & 0xFF))
  }

  test("gray writer output (full AC coefficients): dims equal, pixels within IDCT tolerance") {
    val w = 37; val h = 23 // non-multiple-of-8: edge MCU cropping
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (math.sin(x * 0.7) * 100 + math.cos(y * 1.3) * 80 + 128)
        .toInt.max(0).min(255)
      img.getRaster.setSample(x, y, 0, v)
    }
    for (q <- Seq(0.6f, 0.85f, 0.95f)) {
      val bytes = writeJpeg(img, q)
      val mine = JpegCodec.decode(bytes)
        .getOrElse(fail(s"decode failed q=$q"))
      assert(mine.width === w && mine.height === h && mine.channels === 1)
      val ref = imageioDecode(bytes)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs((mine.data(y * w + x) & 0xFF) -
          ref.getRaster.getSample(x, y, 0))
        maxDiff = math.max(maxDiff, d)
      }
      // same stream, two IDCT implementations: T.81 Annex A tolerance
      assert(maxDiff <= 1, s"q=$q maxDiff=$maxDiff")
    }
  }

  test("color writer output: 4:2:0 subsampled stream decodes within upsampling tolerance") {
    val w = 40; val h = 32
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / (w - 1)).min(255)
      val g = (y * 255 / (h - 1)).min(255)
      val b = ((x + y) * 255 / (w + h - 2)).min(255)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = writeJpeg(img, 0.8f)
    val mine = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert(mine.width === w && mine.height === h && mine.channels === 3)
    val ref = imageioDecode(bytes)
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      val mv = mine.data((y * w + x) * 3 + c) & 0xFF
      val d = math.abs(rv - mv)
      sumDiff += d; maxDiff = math.max(maxDiff, d)
    }
    val mean = sumDiff.toDouble / (w * h * 3)
    // box vs libjpeg's fancy (triangle) chroma upsampling: smooth
    // gradients stay close; Y itself is IDCT-exact
    assert(mean <= 3.0, s"mean=$mean")
    assert(maxDiff <= 48, s"maxDiff=$maxDiff")
    // neutral-chroma color image (R=G=B): upsampling of flat chroma is
    // exact, so the full pipeline is pixel-tight
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * 7 + y * 13) % 256)
      gray.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val gb = writeJpeg(gray, 0.85f)
    val gm = JpegCodec.decode(gb).get
    val gr = imageioDecode(gb)
    var gMax = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (gr.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      val mv = gm.data((y * w + x) * 3 + c) & 0xFF
      gMax = math.max(gMax, math.abs(rv - mv))
    }
    assert(gMax <= 2, s"neutral-chroma maxDiff=$gMax")
  }

  test("progressive DC-only fixture: pixel-exact, equals the baseline encoding, imageio agrees") {
    for (id <- Seq(0L, 3L, 42L, 100002L, 999984L)) {
      val (w, h) = ((8 * (1 + id % 4)).toInt, (8 * (1 + id % 3)).toInt)
      def pix(b: Int): Int = (((id % 100003) * 31 + b * 7) % 256).toInt
      val prog = JpegCodec.encodeGrayDcOnlyProgressive(w, h,
        b => pix(b) - 128)
      // SOF2 actually present (not a baseline stream in disguise)
      assert(prog.sliding(2).exists(s =>
        (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xC2))
      val r = JpegCodec.decode(prog).getOrElse(fail(s"decode failed id=$id"))
      assert(r.width === w && r.height === h && r.channels === 1)
      val bw = w / 8
      for (y <- 0 until h; x <- 0 until w)
        assert((r.data(y * w + x) & 0xFF) === pix((y / 8) * bw + (x / 8)),
          s"id=$id pixel ($x,$y)")
      // identical pixels to the baseline encoding of the same image
      val base = JpegCodec.decode(
        JpegCodec.encodeGrayDcOnly(w, h, b => pix(b) - 128)).get
      assert(r.data.toSeq === base.data.toSeq)
      // and the fixture is REAL progressive JPEG: imageio reads the
      // same raw samples
      val img = imageioDecode(prog)
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) ===
          pix((y / 8) * bw + (x / 8)))
    }
  }

  test("progressive restart markers: per-scan RSTn resync decodes identically") {
    val id = 65537L
    val (w, h) = (32, 24)
    def pix(b: Int): Int = ((id * 31 + b * 7) % 256).toInt
    val plain = JpegCodec.encodeGrayDcOnlyProgressive(w, h, b => pix(b) - 128)
    val rst = JpegCodec.encodeGrayDcOnlyProgressive(w, h, b => pix(b) - 128,
      restartInterval = 2)
    assert(rst.length > plain.length, "RST markers must be present")
    assert(JpegCodec.decode(plain).get.data.toSeq ===
      JpegCodec.decode(rst).get.data.toSeq)
    val img = imageioDecode(rst)
    val mine = JpegCodec.decode(rst).get
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === (mine.data(y * w + x) & 0xFF))
  }

  test("imageio's progressive writer (gray, multi-scan successive approximation): within IDCT tolerance") {
    val w = 37; val h = 23 // non-multiple-of-8: edge MCU cropping
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (math.sin(x * 0.7) * 100 + math.cos(y * 1.3) * 80 + 128)
        .toInt.max(0).min(255)
      img.getRaster.setSample(x, y, 0, v)
    }
    for (q <- Seq(0.6f, 0.85f, 0.95f)) {
      val bytes = writeJpeg(img, q, progressive = true)
      val mine = JpegCodec.decode(bytes)
        .getOrElse(fail(s"progressive decode failed q=$q"))
      assert(mine.width === w && mine.height === h && mine.channels === 1)
      val ref = imageioDecode(bytes)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDiff = math.max(maxDiff, math.abs((mine.data(y * w + x) & 0xFF) -
          ref.getRaster.getSample(x, y, 0)))
      assert(maxDiff <= 1, s"q=$q maxDiff=$maxDiff")
    }
  }

  test("imageio's progressive writer (color 4:2:0): within upsampling tolerance") {
    val w = 40; val h = 32
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / (w - 1)).min(255)
      val g = (y * 255 / (h - 1)).min(255)
      val b = ((x + y) * 255 / (w + h - 2)).min(255)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = writeJpeg(img, 0.8f, progressive = true)
    val mine = JpegCodec.decode(bytes)
      .getOrElse(fail("progressive color decode failed"))
    assert(mine.width === w && mine.height === h && mine.channels === 3)
    val ref = imageioDecode(bytes)
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rv = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      val mv = mine.data((y * w + x) * 3 + c) & 0xFF
      val d = math.abs(rv - mv)
      sumDiff += d; maxDiff = math.max(maxDiff, d)
    }
    val mean = sumDiff.toDouble / (w * h * 3)
    assert(mean <= 3.0, s"mean=$mean")
    assert(maxDiff <= 48, s"maxDiff=$maxDiff")
  }

  test("arithmetic/garbage/truncation refuse loudly (None)") {
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(Array.empty[Byte]).isEmpty)
    val ok = JpegCodec.encodeGrayDcOnly(16, 16, _ => 5)
    assert(JpegCodec.decode(ok.take(ok.length / 2)).isEmpty,
      "truncated stream must refuse")
    val prog = JpegCodec.encodeGrayDcOnlyProgressive(16, 16, _ => 5)
    assert(JpegCodec.decode(prog.take(prog.length / 2)).isEmpty,
      "truncated progressive stream must refuse")
  }

  test("decodeStats: raw-sample sums, all three channels carry gray") {
    for (id <- Seq(3L, 10L, 77L)) {
      val (w, h) = ((8 * (1 + id % 4)).toInt, (8 * (1 + id % 3)).toInt)
      val bytes = JpegCodec.encodeGrayDcOnly(w, h,
        b => ((id * 31 + b * 7) % 256).toInt - 128)
      val mine = JpegCodec.decodeStats(bytes).get
      // ground truth from imageio's RAW raster (getRGB would
      // color-manage linear gray into sRGB)
      val img = imageioDecode(bytes)
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w)
        sum += img.getRaster.getSample(x, y, 0)
      assert(mine.width === w && mine.height === h)
      assert(mine.sumR === sum && mine.sumG === sum && mine.sumB === sum)
    }
  }
}
