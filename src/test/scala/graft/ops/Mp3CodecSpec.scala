package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** MP3 frame-header walker: exact frame lengths from the public Layer
  * III formula (VBR), ID3 wrappers walked over, loud refusals on
  * anything the declared scope doesn't cover. */
class Mp3CodecSpec extends AnyFunSuite {

  test("frame walk: counts, summed bytes, and integer duration match the formula") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 14L, 100003L)) {
      val bytes = Mp3Codec.FixtureMp3.bytes(id)
      val m = Mp3Codec.meta(bytes).getOrElse(fail(s"meta failed id=$id"))
      val srIdx = (id % 3).toInt
      val sr = Seq(44100, 48000, 32000)(srIdx)
      val n = (5 + id % 7).toInt
      assert(m.sampleRate === sr && m.nFrames === n)
      assert(m.channels === (if (id % 4 == 0) 1 else 2))
      val kbpsTable = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320)
      val expectedBytes = (0 until n).map { i =>
        val kbps = kbpsTable((((id + i) % 14)).toInt)
        144 * (kbps * 1000) / sr + ((id + i) % 2).toInt
      }.sum.toLong
      assert(m.frameBytes === expectedBytes, s"id=$id")
      assert(m.durationMs === n.toLong * 1152 * 1000 / sr)
    }
  }

  test("ID3v2 prefix and ID3v1 trailer are walked over, never counted as frames") {
    val specs = Seq((5, 0), (9, 1), (14, 0))
    val plain = Mp3Codec.buildFrames(0, mono = false, specs)
    val wrapped = Mp3Codec.buildFrames(0, mono = false, specs,
      id3v2 = true, id3v1 = true)
    assert(wrapped.length > plain.length + 128)
    val a = Mp3Codec.meta(plain).get
    val b = Mp3Codec.meta(wrapped).get
    assert(a === b, "tags must not change the parsed metadata")
    assert(a.nFrames === 3)
  }

  test("scope gates refuse loudly: desync, truncation, free-format, inconsistent streams, garbage") {
    val ok = Mp3Codec.buildFrames(1, mono = true, Seq((5, 0), (5, 1)))
    assert(Mp3Codec.meta(ok).isDefined)
    // truncated mid-frame
    assert(Mp3Codec.meta(ok.take(ok.length - 10)).isEmpty)
    // desync: garbage between frames
    val desync = ok ++ Array[Byte](0x12, 0x34, 0x56, 0x78)
    assert(Mp3Codec.meta(desync).isEmpty)
    // free-format bitrate (index 0)
    val free = ok.clone()
    free(2) = (free(2) & 0x0F).toByte
    assert(Mp3Codec.meta(free).isEmpty)
    // MPEG-2 version bits
    val v2 = ok.clone()
    v2(1) = (v2(1) & 0xF7).toByte
    assert(Mp3Codec.meta(v2).isEmpty)
    assert(Mp3Codec.meta("not an mp3".getBytes).isEmpty)
    assert(Mp3Codec.meta(Array.empty[Byte]).isEmpty)
    // sample rate changing mid-stream
    val f1 = Mp3Codec.buildFrames(0, mono = false, Seq((5, 0)))
    val f2 = Mp3Codec.buildFrames(1, mono = false, Seq((5, 0)))
    assert(Mp3Codec.meta(f1 ++ f2).isEmpty)
  }
}
