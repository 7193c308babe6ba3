package graft
import graft.multimodal.ImageCodec

/** Dev-only (round 16): single-thread micro-benchmark of the ImageCodec
  * hot path that dominates q100/q118/q119 (synth → PNG encode → decode →
  * dHash; GIF encode/decode). No Spark — isolates per-image codec cost
  * from the distributed plumbing (guide §1.1 first-principles pass).
  */
object ProfileCodecR16 {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    def bench(name: String)(f: Int => Unit): Unit = {
      // one warm round, two timed
      (1 to 2).foreach(_ => (0 until math.min(n / 4, 2000)).foreach(f))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); (0 until n).foreach(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"[codec] $name%-34s ${times.min}%7.3fs for $n → ${times.min / n * 1e6}%8.2f µs/op")
    }

    // q100 shape: 32x24 gray, 40 distinct seeds, brighten 1/3 of the time
    val pngs = (0 until 40).map(s => ImageCodec.renderGrayPng(s, 32, 24)).toArray
    bench("renderGrayPng 32x24")(i => ImageCodec.renderGrayPng(i % 40, 32, 24))
    bench("decode png 32x24")(i => ImageCodec.decode(pngs(i % 40)))
    bench("dHash64 png 32x24")(i => ImageCodec.dHash64(pngs(i % 40)))
    bench("brighten+reencode 32x24")(i => ImageCodec.brighten(pngs(i % 40), 10))
    val imgs = pngs.map(p => ImageCodec.decode(p).get)
    bench("encodePng (img ready) 32x24")(i => ImageCodec.encodePng(imgs(i % 40)))

    // q119 shape: 16x12 gray frames, 3-5 per gif
    val frames = (0 until 5).map(i => ImageCodec.decode(ImageCodec.renderGrayPng(100 + i, 16, 12)).get)
    val gif    = ImageCodec.encodeAnimatedGif(frames)
    bench("render+decode frame 16x12")(i => ImageCodec.decode(ImageCodec.renderGrayPng(i, 16, 12)).get)
    bench("encodeAnimatedGif 5f 16x12")(_ => ImageCodec.encodeAnimatedGif(frames))
    bench("decodeGifFrames 5f")(_ => ImageCodec.decodeGifFrames(gif).get)
    bench("encodePng frame 16x12")(i => ImageCodec.encodePng(frames(i % 5)))
    val framePngs = frames.map(ImageCodec.encodePng)
    bench("dHash64 of frame png")(i => ImageCodec.dHash64(framePngs(i % 5)))

    // audio shape: q120 — 4000-frame noise wav + audioHash64
    val wavs = (0 until 30).map(s => graft.multimodal.AudioCodec.renderNoiseWav(s, 4000, 8000)).toArray
    bench("renderNoiseWav 4000f")(i => graft.multimodal.AudioCodec.renderNoiseWav(i % 30, 4000, 8000))
    bench("audioHash64 4000f")(i => graft.multimodal.AudioCodec.audioHash64(wavs(i % 30)))
  }
}
