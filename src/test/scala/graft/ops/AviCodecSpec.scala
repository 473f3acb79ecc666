package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-AVI: real RIFF walking + per-frame JPEG decode. */
class AviCodecSpec extends AnyFunSuite {

  test("fixture streams: frame counts, dims, and pixel sums match the formula") {
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 42L, 100003L)) {
      val s = AviCodec.mjpegStats(AviCodec.FixtureMjpeg.bytes(id))
        .getOrElse(fail(s"decode failed id=$id"))
      val (w, h) = JpegCodec.FixtureJpeg.dims(id)
      val nf = AviCodec.FixtureMjpeg.nFrames(id)
      assert(s.width === w && s.height === h && s.nFrames === nf)
      val nb = (w / 8) * (h / 8)
      val expected = (for (f <- 0 until nf; b <- 0 until nb)
        yield AviCodec.FixtureMjpeg.framePixel(id, f, b).toLong * 64L).sum
      assert(s.graySum === expected, s"id=$id")
    }
  }

  test("frames decode for real: a corrupted frame or a count mismatch refuses") {
    val id = 7L
    val bytes = AviCodec.FixtureMjpeg.bytes(id)
    assert(AviCodec.mjpegStats(bytes).isDefined)
    // break one frame's SOI magic (JPEG entropy has no CRC, so a
    // payload bit-flip may still decode — the MAGIC cannot): the JPEG
    // decoder refuses and the container walk must surface it
    def indexOf(hay: Array[Byte], needle: Array[Byte]): Int =
      hay.indices.find(i => i + needle.length <= hay.length &&
        needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
    val dcAt = indexOf(bytes, "00dc".getBytes)
    assert(dcAt > 0, "fixture must carry a 00dc chunk")
    val corrupt = bytes.clone()
    corrupt(dcAt + 8) = 0x00 // frame body starts after tag+size
    assert(AviCodec.mjpegStats(corrupt).isEmpty,
      "an undecodable frame must refuse the whole stream")
    // declared-frame-count mismatch refuses (avih totalFrames doctored)
    val doctored = bytes.clone()
    // avih body starts at RIFF(12) + LIST hdr(8) + 'hdrl'(4) + 'avih'+size(8)
    val totalFramesOff = 12 + 8 + 4 + 8 + 16
    doctored(totalFramesOff) = (doctored(totalFramesOff) + 1).toByte
    assert(AviCodec.mjpegStats(doctored).isEmpty)
    assert(AviCodec.mjpegStats("not an avi".getBytes).isEmpty)
    assert(AviCodec.mjpegStats(Array.empty[Byte]).isEmpty)
    assert(AviCodec.mjpegStats(bytes.take(bytes.length / 2)).isEmpty,
      "truncated container must refuse")
  }

  test("progressive and baseline frame mixes both walk (fixture rotation)") {
    // id % 3 == 0 -> progressive frames; others baseline — both must land
    val prog = AviCodec.mjpegStats(AviCodec.FixtureMjpeg.bytes(3L)).get
    val base = AviCodec.mjpegStats(AviCodec.FixtureMjpeg.bytes(4L)).get
    assert(prog.nFrames === 2 + 3 % 3)
    assert(base.nFrames === 2 + 4 % 3)
  }
}
