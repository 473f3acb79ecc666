package graft.ops

/** Scratch micro-benchmark (not part of the library): isolates the audio
  * decode+fingerprint kernel from Spark to measure thread scaling. */
object AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = 5000
    val wavs = (0L until n.toLong).map(AudioFingerprint.FixtureNearDupAudio.wav).toArray
    def run(threads: Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val per = math.max(1, n / threads)
      val chunks = wavs.grouped(per).toSeq
      val t0 = System.nanoTime()
      val futs = chunks.map(c => pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          var s = 0L
          c.foreach { w =>
            s += AudioFingerprint.decodePcm(w)
              .flatMap(AudioFingerprint.fingerprint64).getOrElse(0L)
          }
          s
        }
      }))
      futs.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup
    run(4); run(4)
    if (args.contains("spin")) {
      println("spinning 32-thread for jstack...")
      for (_ <- 1 to 100) run(32)
    }
    for (t <- Seq(1, 8, 32); _ <- 1 to 3)
      println(f"threads=$t%2d  ${run(t)}%.3fs")
    // synth-only timing
    val t0 = System.nanoTime()
    var bytes = 0L
    (0L until n.toLong).foreach(id => bytes += AudioFingerprint.FixtureNearDupAudio.wav(id).length)
    println(f"synth 1-thread: ${(System.nanoTime() - t0) / 1e9}%.3fs ($bytes bytes)")
  }
}
