package graft.tools

import graft.ops.Multimodal

/** Driver-side micro-bench for the three modality codec sessions:
  * per-payload encode and decode cost of the planted pattern
  * fixtures (PNG thumb, WAV pool, GIF frames). No Spark session —
  * these paths are per-row executor work, and the question this tool
  * answers is "what does one payload cost, and which half is it" (the
  * mm_* near-dup gates' wall time is n_docs × these numbers ÷
  * parallelism). Run: `sbt "runMain graft.tools.CodecBench [n]`.
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    def timed(label: String)(body: Int => Unit): Unit = {
      var i = 0
      while (i < math.min(n / 10, 500)) { body(i); i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { body(i); i += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      // scalastyle:off println
      println(f"$label%-28s ${s}%7.2f s  (${s / n * 1e6}%7.1f us/payload)")
      // scalastyle:on println
    }
    val img = new Multimodal.ImageDecoderSession
    val pngs = Array.tabulate(256)(i =>
      img.encodePatternPng(i.toLong, bump = false))
    timed("png encode (32x32 pattern)")(i =>
      img.encodePatternPng(i.toLong, bump = false))
    timed("png decode+thumb 8x8")(i => img.grayThumb(pngs(i % 256), 8))

    val aud = new Multimodal.AudioDecoderSession
    val wavs = Array.tabulate(256)(i =>
      aud.encodePatternWav(i.toLong, bump = false))
    timed("wav encode (3072 samples)")(i =>
      aud.encodePatternWav(i.toLong, bump = false))
    timed("wav decode+pool 64")(i => aud.pooledPcm(wavs(i % 256), 64))

    val vid = new Multimodal.VideoDecoderSession
    def colors(seed: Long) = Array.tabulate(16) { f =>
      var z = seed * 0x9E3779B97F4A7C15L + f * 2654435761L
      z ^= z >>> 27; z *= 0xBF58476D1CE4E5B9L; z ^= z >>> 33
      (32 + (z & 0x7F).toInt, 32 + ((z >>> 8) & 0x7F).toInt,
        32 + ((z >>> 16) & 0x7F).toInt)
    }
    val gifs = Array.tabulate(256)(i =>
      vid.encodeSolidGif(8, 8, colors(i.toLong)))
    timed("gif encode (16 frames 8x8)")(i =>
      vid.encodeSolidGif(8, 8, colors(i.toLong)))
    timed("gif decode (16 frames)")(i => vid.decodeFrames(gifs(i % 256)))
  }
}
