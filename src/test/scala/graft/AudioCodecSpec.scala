package graft

import graft.multimodal.{AudioCodec, Multimodal}
import org.apache.spark.sql.functions._

/** The REAL audio codec (javax.sound.sampled) and its pipeline wiring:
  * header decode, PCM sample decode, signal features (q94/q95's machinery).
  */
class AudioCodecSpec extends SparkSpec {

  test("decodeMeta reads the WAV header: rate, channels, bits, frames, format") {
    val wav = AudioCodec.renderSquareWav(period = 5, frames = 320, sampleRate = 8000)
    assert(AudioCodec.decodeMeta(wav) === Some((8000, 1, 16, 320L, "wav")))
  }

  test("decodeMeta returns None for bytes no reader claims") {
    assert(AudioCodec.decodeMeta("not audio at all".getBytes("UTF-8")) === None)
    assert(AudioCodec.decodeMeta(Array.emptyByteArray) === None)
    assert(AudioCodec.decodeMeta(null) === None)
  }

  test("decodeSamplesMono round-trips the exact PCM samples") {
    val samples = Array[Short](1000, -2000, 3000, 0, -32768, 32767)
    val wav = AudioCodec.encodeWavMono(samples, 8000)
    val back = AudioCodec.decodeSamplesMono(wav).get
    assert(back.length === samples.length)
    samples.indices.foreach { i =>
      assert(back(i) === samples(i) / 32768.0f, s"sample $i")
    }
  }

  test("square-wave closed forms: rms exactly 0.5, crossings floor((n-1)/p)") {
    for ((p, n) <- Seq((2, 100), (7, 333), (10, 101), (3, 4))) {
      val s = AudioCodec.decodeSamplesMono(AudioCodec.renderSquareWav(p, n)).get
      assert(AudioCodec.rms(s) === 0.5, s"rms p=$p n=$n")
      assert(AudioCodec.zeroCrossings(s) === ((n - 1) / p).toLong, s"crossings p=$p n=$n")
    }
  }

  test("zeroCrossings: zeros keep the previous sign (silence doesn't inflate)") {
    assert(AudioCodec.zeroCrossings(Array(0.5f, 0f, 0f, 0.5f)) === 0L)
    assert(AudioCodec.zeroCrossings(Array(0.5f, 0f, -0.5f, 0.5f)) === 2L)
    assert(AudioCodec.zeroCrossings(Array(0f, 0f)) === 0L)
  }

  test("decodeAudioMeta: real header for WAV payloads, null struct for the rest") {
    import spark.implicits._
    val df = Seq((1L, AudioCodec.renderSquareWav(3, 250)), (2L, "garbage".getBytes("UTF-8")))
      .toDF("id", "wav_bytes")
    val out = Multimodal.decodeAudioMeta(df, "wav_bytes")
      .select($"id", $"meta").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val m = out(1L).get
    assert((m.getInt(0), m.getInt(1), m.getInt(2), m.getLong(3), m.getString(4)) ===
      ((8000, 1, 16, 250L, "wav")))
    assert(out(2L).isEmpty)
  }

  test("audioFeatures computes rms/crossings/frames from a real PCM decode") {
    import spark.implicits._
    val df = Seq((1L, AudioCodec.renderSquareWav(4, 200)), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "wav_bytes")
    val out = Multimodal.audioFeatures(df, "wav_bytes")
      .select($"id", $"audio").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val f = out(1L).get
    assert(f.getDouble(0) === 0.5)
    assert(f.getLong(1) === 49L) // floor(199/4)
    assert(f.getLong(2) === 200L)
    assert(out(2L).isEmpty)
  }

  test("synthSquareWavs renders per-row deterministic payloads (q94's fixture contract)") {
    import spark.implicits._
    val df = Seq(3L, 20L).toDF("doc_id")
    val out = Multimodal.synthSquareWavs(df,
        period = col("doc_id") % 9 + 2, frames = col("doc_id") % 500 + 100)
      .select($"doc_id", $"wav_bytes").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(out(3L), AudioCodec.renderSquareWav(5, 103)))
    assert(java.util.Arrays.equals(out(20L), AudioCodec.renderSquareWav(4, 120)))
  }
}
