package graft.examples

import graft.operators.Multimodal

/** Microbench for the image kernels behind q_multimodal_decode /
  * q_image_neardup / q_multimodal_resize (r19 optimization round):
  * times synth (PNG encode) and aHash/decode (PNG decode) separately,
  * single-threaded and at N threads, so the per-image cost and any
  * cross-thread contention (javax.imageio registry lookups are a
  * per-call service scan) are visible before touching the kernels.
  *
  * Usage: sbt "runMain graft.examples.MultimodalKernelAB [nImages] [threads]"
  */
object MultimodalKernelAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val threads = args.drop(1).headOption.map(_.toInt).getOrElse(32)

    def synthOne(i: Long): Array[Byte] = {
      val id = i % 1000000L
      Multimodal.synthGradientPng(
        (32 + id % 16).toInt, (32 + (id * 3) % 16).toInt, 0,
        ax = (1 + 2 * (id % 61)).toInt, by = (1 + 2 * (id % 67)).toInt)
    }

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mm-kernel] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm-up
    (0 until 200).foreach(i => Multimodal.aHash(synthOne(i.toLong)))

    val payloads = timed(s"synth x$n single-thread") {
      Array.tabulate(n)(i => synthOne(i.toLong))
    }
    timed(s"aHash x$n single-thread") {
      payloads.foreach(Multimodal.aHash(_))
    }
    timed(s"decodeImage x$n single-thread") {
      payloads.foreach(Multimodal.decodeImage(_))
    }

    def parallel(label: String)(work: Int => Unit): Unit = timed(s"$label x$n @$threads threads") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val futs = (0 until threads).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var i = t
              while (i < n) { work(i); i += threads }
            }
          })
        }
        futs.foreach(_.get())
      } finally pool.shutdown()
    }

    parallel("synth")(i => synthOne(i.toLong))
    parallel("aHash")(i => Multimodal.aHash(payloads(i)))
    parallel("decodeImage")(i => Multimodal.decodeImage(payloads(i)))

    // audio kernels (r20): decodeAudio was SPI-lock-bound before the
    // once-per-JVM AudioFileReader resolution (r19 measured 32 threads
    // 2.7× SLOWER than one) — this section is the thread-scaling proof
    // for the fix (the withSyntheticAudio fixture parameters, verbatim)
    def synthWavOne(i: Long): Array[Byte] = {
      val id = i % 1000000L
      Multimodal.synthWav(
        sampleRate = (8000 + (id % 8) * 1000).toInt,
        channels = (1 + id % 2).toInt,
        frames = (256 + id % 256).toInt,
        amplitude = ((id % 1000) * 16).toInt)
    }
    (0 until 200).foreach(i => Multimodal.decodeAudio(synthWavOne(i.toLong)))
    val wavs = timed(s"synthWav x$n single-thread") {
      Array.tabulate(n)(i => synthWavOne(i.toLong))
    }
    timed(s"decodeAudio x$n single-thread") {
      wavs.foreach(Multimodal.decodeAudio(_))
    }
    parallel("synthWav")(i => synthWavOne(i.toLong))
    parallel("decodeAudio")(i => Multimodal.decodeAudio(wavs(i)))
  }
}
