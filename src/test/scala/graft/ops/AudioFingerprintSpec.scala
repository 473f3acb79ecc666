package graft.ops

import graft.SparkSuite

/** Audio fingerprinting: kernel determinism, WAV/FLAC decode paths,
  * near-dup separation on the chirp fixture, LSH-vs-brute-force recall
  * equality, and null behavior for undecodable payloads. */
class AudioFingerprintSpec extends SparkSuite {

  import spark.implicits._
  import AudioFingerprint._

  private def pcmOf(id: Long): Array[Int] =
    Array.tabulate(FixtureNearDupAudio.nSamples(id))(i =>
      FixtureNearDupAudio.sample(id, i).toInt)
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("fingerprint64: deterministic, 63-bit, WAV decode == formula") {
    val s = pcmOf(5L)
    val fp = fingerprint64(s).get
    assert(fp >= 0L && fingerprint64(s).get === fp)
    val decoded = decodePcm(FixtureNearDupAudio.wav(5L)).get
    assert(decoded.toSeq === s.toSeq,
      "a lossless WAV round trip must reproduce the PCM exactly")
    assert(fingerprint64(decoded).get === fp)
    assert(fingerprint64(new Array[Int](63)).isEmpty,
      "below the 64-sample floor there is no fingerprint")
  }

  test("the FLAC decode path fingerprints the same PCM identically") {
    val s = pcmOf(9L)
    val flac = FlacCodec.encode(8000, 1, s)
    val viaFlac = decodePcm(flac).get
    assert(viaFlac.toSeq === s.toSeq,
      "FLAC is lossless: decode must invert encode")
    assert(fingerprint64(viaFlac).get === fingerprint64(s).get)
  }

  test("near-identical clips fingerprint close; distinct clips far") {
    // 2 and 33 share group 2; 2 and 3 are different chirps
    val same = ham(fingerprint64(pcmOf(2L)).get, fingerprint64(pcmOf(33L)).get)
    val diff = ham(fingerprint64(pcmOf(2L)).get, fingerprint64(pcmOf(3L)).get)
    assert(same <= 6, s"same-group clips must be within the radius ($same)")
    assert(diff > 6, s"different-group clips must be far apart ($diff)")
  }

  test("undecodable payloads fingerprint to null") {
    val df = Seq(
      (1L, "not audio".getBytes("UTF-8")),
      (2L, FixtureNearDupAudio.wav(2L))).toDF("doc_id", "media")
    val rows = audioFingerprints(df).collect().sortBy(_.getLong(0))
    assert(rows(0).isNullAt(2) && !rows(1).isNullAt(2))
  }

  test("afpGroups: one component per fixture group; afpIncremental equals brute force") {
    val docs = (0L until 93L).toDF("doc_id")
    val groups = afpGroups(synthesizeNearDupWavs(docs),
      maxHamming = 6, maxBucketSize = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(groups.length === 31 && groups.forall(_._2 === 3L))
    val corpus = synthesizeNearDupWavs(docs)
    val batch = synthesizeNearDupWavs(
      (0L until 93L by 10L).map(_ + 1000000L).toDF("doc_id"))
    val got = afpIncremental(corpus, batch,
      maxHamming = 6, maxBucketSize = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ch = audioFingerprints(corpus).select("doc_id", "afp")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bh = audioFingerprints(batch).select("doc_id", "afp")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for { (b, fb) <- bh; (c, fc) <- ch if ham(fb, fc) <= 6 }
      yield (b, c, ham(fb, fc))).toSet
    assert(brute.nonEmpty && got === brute)
  }

  test("afpPairs equals brute force: banded LSH recall is complete at the radius") {
    val docs = (0L until 120L).toDF("doc_id")
    val media = synthesizeNearDupWavs(docs)
    val lsh = afpPairs(media, maxHamming = 6, maxBucketSize = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fps = audioFingerprints(media).select("doc_id", "afp")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && ham(fa, fb) <= 6
    } yield (a, b, ham(fa, fb))).toSet
    assert(brute.nonEmpty, "fixture must produce near-dup pairs")
    assert(lsh === brute)
    assert(brute.forall { case (a, b, _) => a % 31 == b % 31 })
  }
}
