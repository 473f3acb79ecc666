package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem, UnsupportedAudioFileException}

/** Pins the assumption behind [[Multimodal.WavCodec.openAudioStream]]: the
  * cached, reordered SPI walk must resolve every container to the SAME
  * reader/format as `AudioSystem.getAudioInputStream` — including the two
  * orderings the cache relies on (SoftMidi moved last; the com.sun WAVE
  * readers kept in relative ServiceLoader order even though their RIFF
  * magics overlap among themselves). */
class AudioSpiParitySpec extends AnyFunSuite {

  /** Reject = AudioSystem throws UnsupportedAudioFileException and
    * openAudioStream returns null; Accept = both return a stream. */
  private sealed trait Outcome
  private case class Accepted(format: String, pcm: Seq[Byte]) extends Outcome
  private case object Rejected extends Outcome

  private def outcome(open: => AudioInputStream): Outcome = {
    val ais = try open catch {
      case _: UnsupportedAudioFileException => null
    }
    if (ais == null) Rejected
    else Accepted(ais.getFormat.toString, ais.readAllBytes().toSeq)
  }

  private def viaAudioSystem(bytes: Array[Byte]): Outcome =
    outcome(AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
  private def viaCache(bytes: Array[Byte]): Outcome =
    outcome(Multimodal.WavCodec.openAudioStream(bytes))

  private def pcmStream(): AudioInputStream = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val samples = Array.tabulate(256)(i => (math.sin(i / 7.0) * 12000).toInt)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xFF).toByte; raw(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
  }

  private def container(tpe: AudioFileFormat.Type): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(pcmStream(), tpe, out)
    out.toByteArray
  }

  private val fixtures: Seq[(String, Array[Byte])] = Seq(
    "WAV (fixture chirp)" -> AudioFingerprint.FixtureNearDupAudio.wav(3L),
    "WAV (AudioSystem-written)" -> container(AudioFileFormat.Type.WAVE),
    "AIFF" -> container(AudioFileFormat.Type.AIFF),
    "AU" -> container(AudioFileFormat.Type.AU),
    "garbage" -> Array.tabulate(512)(i => (i * 37 + 11).toByte),
    "text" -> "definitely not audio, not even close".getBytes("UTF-8"),
    "truncated RIFF magic" -> "RIFF".getBytes("UTF-8"))

  test("openAudioStream matches AudioSystem.getAudioInputStream on every container") {
    fixtures.foreach { case (name, bytes) =>
      val sys = viaAudioSystem(bytes)
      val cached = viaCache(bytes)
      assert(cached === sys, s"SPI parity broke for $name")
      if (name.startsWith("WAV") || name == "AIFF" || name == "AU")
        assert(sys.isInstanceOf[Accepted], s"$name should decode")
      else assert(sys === Rejected, s"$name should be rejected by both")
    }
  }

  test("the cached reader list keeps every SPI provider exactly once, MIDI last") {
    val cached = Multimodal.WavCodec.audioFileReaders.map(_.getClass.getName)
    val loaded = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      var l = List.empty[String]
      while (it.hasNext) l ::= it.next().getClass.getName
      l.reverse
    }
    assert(cached.sorted === loaded.sorted, "cache must be a permutation")
    // the com.sun WAVE-family readers keep their relative ServiceLoader
    // order (their magics are not disjoint among THEMSELVES)
    val waveish = (n: String) => n.startsWith("com.sun.media.sound.") &&
      !n.contains("SoftMidi")
    assert(cached.filter(waveish) === loaded.filter(waveish),
      "non-MIDI JDK readers must keep ServiceLoader relative order")
    cached.filter(_.contains("SoftMidi")).foreach { m =>
      assert(cached.last === m, "SoftMidi must probe last")
    }
  }
}
