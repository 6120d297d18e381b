package graft

/** Round-21 micro A/B for the multimodal codec seam, no Spark: encode+
  * decode N payloads on 1 vs K threads to expose JVM-global locks in
  * the javax.imageio / javax.sound.sampled paths (the id-repartition
  * of the multimodal keys only pays off if the codec actually scales
  * across tasks). Usage: runMain graft.CodecAb [nRows] [threads] */
object CodecAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val k = args.lift(1).map(_.toInt).getOrElse(32)
    def wavOnce(id: Long): Int = {
      val bytes = graft.ops.Multimodal.wavBytes(id)
      bytes.length
    }
    def wavRound(id: Long): Int = {
      val bytes = graft.ops.Multimodal.wavBytes(id)
      val ais = graft.ops.Multimodal.readAudioForAb(bytes)
      ais.getFormat.getSampleRate.toInt + ais.readAllBytes().length
    }
    def pngRound(id: Long): Int = {
      val bytes = graft.ops.Multimodal.pngBytes(id)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      img.getWidth
    }
    def time(name: String, threads: Int)(f: Long => Int): Unit = {
      val t0 = System.nanoTime()
      if (threads == 1) { var i = 0L; var acc = 0L
        while (i < n) { acc += f(i); i += 1 }
        if (acc == -1) println("?")
      } else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        val per = n / threads
        val fs = (0 until threads).map { t =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = {
              var i = t.toLong * per; var acc = 0L
              val end = i + per
              while (i < end) { acc += f(i); i += 1 }
              acc
            }
          })
        }
        fs.foreach(_.get()); pool.shutdown()
      }
      println(f"CODECAB $name threads=$threads ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val cached = (0L until 64L).map(id =>
      graft.ops.Multimodal.wavBytes(id)).toArray
    def wavHeaderOnly(id: Long): Int = {
      val ais = graft.ops.Multimodal.readAudioForAb(
        cached((id % 64).toInt))
      ais.getFormat.getSampleRate.toInt
    }
    def wavReadAll(id: Long): Int = {
      val ais = graft.ops.Multimodal.readAudioForAb(
        cached((id % 64).toInt))
      ais.readAllBytes().length
    }
    // warm JIT
    time("wav_encode_warm", 1)(wavOnce)
    time("wav_encode", 1)(wavOnce)
    time("wav_encode", k)(wavOnce)
    time("wav_header", 1)(wavHeaderOnly)
    time("wav_header", k)(wavHeaderOnly)
    time("wav_readall", 1)(wavReadAll)
    time("wav_readall", k)(wavReadAll)
    time("wav_roundtrip", 1)(wavRound)
    time("wav_roundtrip", k)(wavRound)
    time("png_roundtrip", 1)(pngRound)
    time("png_roundtrip", k)(pngRound)
  }
}
