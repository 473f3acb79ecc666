package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch FLAC codec: LOSSLESS means every encode must decode
  * back bit-exactly — round-trips across all subframe strategies and
  * stereo decorrelations, multi-frame streams with ragged tails, CRC
  * corruption refusing loudly, and stats agreeing with the WAV codec
  * on the shared fixture formula. */
class FlacCodecSpec extends AnyFunSuite {

  private def pcm(id: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i =>
      (((id % 100003) * 131 + i.toLong * 7919) % 65536 - 32768).toInt)

  test("mono round-trips bit-exactly: verbatim and every fixed order, multi-frame + ragged tail") {
    for {
      strat <- Seq[FlacCodec.Strategy](FlacCodec.Verbatim,
        FlacCodec.Fixed(0), FlacCodec.Fixed(1), FlacCodec.Fixed(2),
        FlacCodec.Fixed(3), FlacCodec.Fixed(4))
      n <- Seq(200, 256, 801) // sub-block, exact block, multi-frame ragged
    } {
      val xs = pcm(42L, n)
      val bytes = FlacCodec.encode(8000, 1, xs, strat)
      val p = FlacCodec.decode(bytes)
        .getOrElse(fail(s"decode failed strat=$strat n=$n"))
      assert(p.sampleRate === 8000 && p.channels === 1 && p.bps === 16)
      assert(p.samples.toSeq === xs.toSeq, s"strat=$strat n=$n")
    }
  }

  test("LPC subframes round-trip bit-exactly (coefficient/precision/shift parsing + 64-bit accumulator)") {
    for {
      shift <- Seq(0, 4, 9)
      order <- Seq(1, 2, 4)
      n <- Seq(256, 801)
    } {
      val xs = pcm(11L, n)
      val bytes = FlacCodec.encode(8000, 1, xs, FlacCodec.Lpc(order, shift))
      val p = FlacCodec.decode(bytes)
        .getOrElse(fail(s"LPC decode failed order=$order shift=$shift"))
      assert(p.samples.toSeq === xs.toSeq, s"order=$order shift=$shift n=$n")
    }
    // stereo LPC with side channels too
    val n = 512
    val inter = new Array[Int](n * 2)
    for (i <- 0 until n) {
      inter(2 * i) = pcm(13L, n)(i)
      inter(2 * i + 1) = pcm(17L, n)(i) / 2
    }
    val b = FlacCodec.encode(8000, 2, inter, FlacCodec.Lpc(2, 4),
      FlacCodec.MidSide)
    assert(FlacCodec.decode(b).get.samples.toSeq === inter.toSeq)
  }

  test("wasted bits and CONSTANT subframes round-trip") {
    // all samples share 2 low zero bits -> encoder emits a wasted-bits
    // prefix; decoder must shift them back in
    val xs = pcm(9L, 500).map(v => (v >> 2) << 2)
    for (strat <- Seq[FlacCodec.Strategy](FlacCodec.Verbatim,
        FlacCodec.Fixed(2), FlacCodec.Lpc(2, 4))) {
      val bytes = FlacCodec.encode(8000, 1, xs, strat)
      assert(FlacCodec.decode(bytes).get.samples.toSeq === xs.toSeq,
        s"wasted-bits strat=$strat")
    }
    // flat signal -> CONSTANT subframe, a few bytes per frame
    val flat = Array.fill(1000)(-12345)
    val cb = FlacCodec.encode(8000, 1, flat, FlacCodec.Verbatim)
    assert(FlacCodec.decode(cb).get.samples.toSeq === flat.toSeq)
    assert(cb.length < 200,
      s"constant subframes should collapse the stream, got ${cb.length}B")
  }

  test("compression is real: fixed prediction beats verbatim on smooth signals") {
    // a gentle ramp has tiny order-2 residuals -> small Rice params
    val xs = Array.tabulate(2048)(i =>
      (2000 * math.sin(i / 90.0)).toInt + i % 7)
    val verbatim = FlacCodec.encode(8000, 1, xs, FlacCodec.Verbatim)
    val fixed = FlacCodec.encode(8000, 1, xs, FlacCodec.Fixed(2))
    assert(FlacCodec.decode(fixed).get.samples.toSeq === xs.toSeq)
    assert(FlacCodec.decode(verbatim).get.samples.toSeq === xs.toSeq)
    assert(fixed.length * 2 < verbatim.length,
      s"fixed ${fixed.length}B should be far below verbatim ${verbatim.length}B")
  }

  test("stereo round-trips bit-exactly under every decorrelation mode") {
    val n = 700
    val inter = new Array[Int](n * 2)
    for (i <- 0 until n) {
      inter(2 * i) = pcm(7L, n)(i)
      inter(2 * i + 1) = (pcm(7L, n)(i) * 3 / 4) - 123 // correlated right
    }
    for (mode <- Seq[FlacCodec.StereoMode](FlacCodec.Independent,
        FlacCodec.LeftSide, FlacCodec.RightSide, FlacCodec.MidSide)) {
      val bytes = FlacCodec.encode(16000, 2, inter, FlacCodec.Fixed(2), mode)
      val p = FlacCodec.decode(bytes).getOrElse(fail(s"decode failed $mode"))
      assert(p.channels === 2 && p.sampleRate === 16000)
      assert(p.samples.toSeq === inter.toSeq, s"mode=$mode")
    }
  }

  test("extreme samples (full int16 range, sign alternation) survive every mode") {
    val n = 300
    val inter = new Array[Int](n * 2)
    for (i <- 0 until n) {
      inter(2 * i) = if (i % 2 == 0) 32767 else -32768
      inter(2 * i + 1) = if (i % 3 == 0) -32768 else 32767
    }
    for (mode <- Seq[FlacCodec.StereoMode](FlacCodec.LeftSide,
        FlacCodec.RightSide, FlacCodec.MidSide)) {
      val bytes = FlacCodec.encode(8000, 2, inter, FlacCodec.Fixed(1), mode)
      assert(FlacCodec.decode(bytes).get.samples.toSeq === inter.toSeq,
        s"mode=$mode")
    }
  }

  test("CRC corruption refuses loudly; garbage and truncation refuse") {
    val xs = pcm(3L, 400)
    val bytes = FlacCodec.encode(8000, 1, xs, FlacCodec.Fixed(2))
    assert(FlacCodec.decode(bytes).isDefined)
    // flip one bit in the middle of the first frame's entropy data
    val corrupt = bytes.clone()
    corrupt(bytes.length / 2) = (corrupt(bytes.length / 2) ^ 0x10).toByte
    assert(FlacCodec.decode(corrupt).isEmpty,
      "a flipped payload bit must fail a CRC, never return wrong samples")
    assert(FlacCodec.decode(bytes.take(bytes.length / 2)).isEmpty)
    assert(FlacCodec.decode("not flac".getBytes).isEmpty)
    assert(FlacCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("decodeStats matches the WAV codec on the shared fixture formula") {
    for (id <- Seq(0L, 1L, 2L, 5L, 77L, 100002L)) {
      val flac = FlacCodec.FixtureFlac.bytes(id)
      val (sr, n, sumAbs, peak, zc) = FlacCodec.decodeStats(flac)
        .getOrElse(fail(s"flac decode failed id=$id"))
      val wav = Multimodal.FixtureWav.wav(id)
      val w = Multimodal.WavCodec.decodeStats(wav)
        .getOrElse(fail(s"wav decode failed id=$id"))
      assert(sr === w.sampleRate && n === w.nSamples)
      assert(sumAbs === w.sumAbs && peak === w.peak && zc === w.zeroCross,
        s"id=$id: the two lossless codecs must agree sample-for-sample")
    }
  }
}
