package graft.ops

import graft.SparkSuite
import graft.ops.Multimodal.Mp4Codec

/** [[Mp4Codec]] — ISO-BMFF box walking: fixture round-trip, mvhd v1
  * 64-bit times, `largesize` headers, uniform-stsz, and the loud/None
  * edges. */
class Mp4CodecSpec extends SparkSuite {

  test("minted fixture round-trips through the real box walk") {
    val bytes = Mp4Codec.buildMinimal("mp42", 1200, 700L, 320, 180,
      Seq(100, 120, 140))
    val m = Mp4Codec.parseMeta(bytes).get
    assert(m.brand === "mp42")
    assert(m.timescale === 1200L && m.duration === 700L)
    assert(m.width === 320 && m.height === 180)
    assert(m.nSamples === 3 && m.sampleBytes === 360L)
  }

  test("mvhd version 1 (64-bit times) parses") {
    val bytes = Mp4Codec.buildMinimal("isom", 90000, 4500000L, 1920, 1080,
      Seq(1000), mvhdV1 = true)
    val m = Mp4Codec.parseMeta(bytes).get
    assert(m.timescale === 90000L && m.duration === 4500000L)
    assert(m.width === 1920 && m.height === 1080)
  }

  test("largesize (size=1 + 64-bit) boxes advance correctly") {
    val base = Mp4Codec.buildMinimal("isom", 600, 300L, 160, 120, Seq(10))
    // append a trailing largesize free box: size=1, type, 64-bit size, body
    val body = new Array[Byte](5)
    val bb = java.nio.ByteBuffer.allocate(16 + body.length)
    bb.putInt(1).put("free".getBytes("ISO-8859-1"))
      .putLong(16L + body.length).put(body)
    val m = Mp4Codec.parseMeta(base ++ bb.array)
    assert(m.get.timescale === 600L, "largesize box must not derail the walk")
  }

  test("non-BMFF bytes and truncated boxes are None, not garbage") {
    assert(Mp4Codec.parseMeta("not a video".getBytes).isEmpty)
    assert(Mp4Codec.parseMeta(null).isEmpty)
    val good = Mp4Codec.buildMinimal("isom", 600, 300L, 160, 120, Seq(10))
    // truncating mid-box corrupts a size bound -> None (never a wrong parse)
    assert(Mp4Codec.parseMeta(good.take(good.length / 2)).isEmpty)
  }
}
