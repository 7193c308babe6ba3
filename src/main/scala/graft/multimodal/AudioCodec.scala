package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec on the JDK's `javax.sound.sampled` (WAV/AIFF/AU readers
  * and writers ship with the JVM — no external codec libraries), the audio
  * sibling of [[ImageCodec]]: header-only metadata decode, PCM sample
  * decode, and deterministic signal features for audio curation pipelines.
  * Reference scope: astro-sdk has no audio type — media columns are
  * beyond-reference builder's-brief scope.
  *
  * Scale notes:
  *  - [[decodeMeta]] parses ONLY the file header (`getAudioFileFormat`
  *    reads the RIFF/AIFF preamble, never the sample data), so a metadata
  *    pass over 100 TB of WAV payloads does no PCM decode.
  *  - Everything is a pure function of the payload bytes — safe inside
  *    batched `mapPartitions`, no shared state.
  *  - Feature math accumulates in Double over integer PCM samples, so
  *    results are bit-stable across JVMs.
  */
object AudioCodec {

  /** Decoded header metadata: (sampleRate, channels, bitsPerSample,
    * frames, format). `format` is the file-type extension lowercased
    * ("wav", "aif", "au"). None for bytes no installed reader claims.
    * Header-only — sample data is not touched.
    */
  def decodeMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long, String)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val f   = aff.getFormat
      Some((f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
        aff.getFrameLength.toLong, aff.getType.getExtension.toLowerCase))
    } catch { case _: Exception => None }
  }

  /** Full PCM decode to mono float samples in [-1, 1] (channels averaged).
    * Supports the signed 16-bit PCM this codec writes plus anything the
    * JDK can convert to it. None if undecodable.
    */
  def decodeSamplesMono(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in  = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        fmt.getSampleRate, 16, fmt.getChannels, 2 * fmt.getChannels,
        fmt.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      try {
        val raw = pcm.readAllBytes()
        val ch  = target.getChannels
        val n   = raw.length / (2 * ch)
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          var sum = 0.0f
          var c = 0
          while (c < ch) {
            val o  = (i * ch + c) * 2
            val s  = ((raw(o) & 0xFF) | (raw(o + 1) << 8)).toShort
            sum += s / 32768.0f
            c += 1
          }
          out(i) = sum / ch
          i += 1
        }
        Some(out)
      } finally { pcm.close(); in.close() }
    } catch { case _: Exception => None }
  }

  /** Root-mean-square level of the mono-mixed signal, in [0, 1]. */
  def rms(samples: Array[Float]): Double = {
    if (samples.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < samples.length) { acc += samples(i).toDouble * samples(i); i += 1 }
    math.sqrt(acc / samples.length)
  }

  /** Strict sign-change count between consecutive samples (a zero sample
    * keeps the previous sign, so silence doesn't inflate the count).
    */
  def zeroCrossings(samples: Array[Float]): Long = {
    var n = 0L
    var prev = 0
    var i = 0
    while (i < samples.length) {
      val s = if (samples(i) > 0f) 1 else if (samples(i) < 0f) -1 else prev
      if (prev != 0 && s != 0 && s != prev) n += 1
      if (s != 0) prev = s
      i += 1
    }
    n
  }

  /** 64-bit perceptual audio hash: 65 equal windows of the mono-mixed
    * signal, bit i set when window i+1 is LOUDER (rms) than window i — the
    * audio analog of [[ImageCodec.dHash64]] (gradient signs survive volume
    * scaling and re-encoding, absolute levels don't). None for undecodable
    * payloads or signals shorter than 2 samples per window (130 frames).
    */
  def audioHash64(bytes: Array[Byte]): Option[Long] =
    decodeSamplesMono(bytes).flatMap { s =>
      val windows = 65
      if (s.length < windows * 2) None
      else {
        val lvl = new Array[Double](windows)
        var w = 0
        while (w < windows) {
          val lo  = (w.toLong * s.length / windows).toInt
          val hi  = ((w + 1).toLong * s.length / windows).toInt
          var acc = 0.0
          var i   = lo
          while (i < hi) { acc += s(i).toDouble * s(i); i += 1 }
          lvl(w) = math.sqrt(acc / math.max(1, hi - lo))
          w += 1
        }
        var h = 0L
        var b = 0
        while (b < 64) {
          if (lvl(b + 1) > lvl(b)) h |= (1L << b)
          b += 1
        }
        Some(h)
      }
    }

  /** Deterministic pseudo-noise WAV (xorshift64* PRNG from `seed`): the
    * fixture generator for audio near-dup — same seed ⇒ byte-identical
    * file, different seeds ⇒ independent streams whose [[audioHash64]]
    * bits are coin flips (expected hamming 32; P(≤4) ≈ 1e-13). NOT part
    * of the codec surface.
    */
  def renderNoiseWav(seed: Long, frames: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(frames >= 1)
    val samples = new Array[Short](frames)
    var x = seed * 2685821657736338717L + 1442695040888963407L
    var i = 0
    while (i < frames) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      samples(i) = ((x * 2685821657736338717L) >>> 48).toShort
      i += 1
    }
    encodeWavMono(samples, sampleRate)
  }

  /** Encode mono 16-bit signed little-endian PCM samples as WAV. */
  def encodeWavMono(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(i * 2) = (samples(i) & 0xFF).toByte
      raw(i * 2 + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic mono square-wave WAV: amplitude ±16384 (= exactly 0.5
    * normalized), sign flips every `period` frames. Pure fixture generator
    * (like [[ImageCodec.renderGrayPng]]): its decoded metadata AND signal
    * features are closed-form in (period, frames) — rms = 0.5 exactly,
    * zeroCrossings = floor((frames-1) / period) — so DuckDB oracle SQL can
    * predict them. NOT part of the codec surface.
    */
  def renderSquareWav(period: Int, frames: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(period >= 1 && frames >= 1)
    val samples = new Array[Short](frames)
    var i = 0
    while (i < frames) {
      samples(i) = if ((i / period) % 2 == 0) 16384 else -16384
      i += 1
    }
    encodeWavMono(samples, sampleRate)
  }
}
