package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines
  * (builder's brief, beyond-reference scope): media travels as opaque
  * `binary` columns with typed metadata structs; per-row work runs batched
  * inside `mapPartitions` — the Scala analog of Arrow-batched
  * `mapInPandas`, with the same plumbing contract (explicit output schema,
  * bounded batch shape, no driver collect).
  *
  * IMAGE decode/resize is REAL ([[ImageCodec]], on the JDK's javax.imageio
  * — PNG/JPEG/GIF/BMP readers ship with the JVM): [[decodeImageMeta]] and
  * [[resizeTo]] run actual byte→pixel work, and [[imageDHash]] computes the
  * standard perceptual near-dup hash. Payloads no installed reader claims
  * fall back to the original deterministic `STUB` functions (documented per
  * method) — that keeps the metadata columns total and the text-payload
  * fixture oracles SQL-expressible. AUDIO is REAL as well ([[AudioCodec]],
  * on the JDK's javax.sound.sampled — WAV/AIFF/AU): [[decodeAudioMeta]]
  * and [[audioFeatures]] run actual header/PCM decode. VIDEO frame
  * sampling and the generic model-embedding [[extractFeatures]] remain
  * stubs (no video codec / NN runtime in the JVM); their batching, schema,
  * and partition-sizing plumbing is the real contract.
  *
  * Scale notes (100 TB of media):
  *  - binary payloads dominate row size; [[repartitionForPayload]] sizes
  *    partitions by payload bytes, not row count, so one partition's batch
  *    fits executor memory.
  *  - metadata-only queries should project the struct column and never
  *    touch the bytes — Parquet column pruning keeps the scan cheap
  *    (verified by ReadSchema in the plan).
  */
object Multimodal {

  /** Typed metadata for an image payload. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
  ))

  /** STUB decode — deterministic fake dimensions from the payload length
    * (a real build links an image codec here; signature and batch shape
    * are the real contract). Kept SQL-expressible so the q-entry has a
    * DuckDB oracle.
    */
  private[multimodal] def stubDecode(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val len = bytes.length
    ((len % 1019) + 1, ((len * 31) % 761) + 1, 3, "fake")
  }

  /** Append a typed `metaCol` struct decoded from `bytesCol`, batched
    * `batchSize` rows at a time inside each partition (the mapInPandas
    * batch-shape contract: bounded memory per batch, schema known up
    * front).
    *
    * REAL header decode via [[ImageCodec.decodeMeta]] (no pixel
    * materialization — O(header) per payload, the right cost for a
    * metadata pass over 100 TB of media); payloads no installed ImageIO
    * reader claims fall back to [[stubDecode]] so the column stays total
    * (and the text-payload fixture oracle stays SQL-predictable).
    */
  def decodeImageMeta(
      df: DataFrame,
      bytesCol: String,
      metaCol: String = "meta",
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(metaCol, imageMetaSchema, nullable = false)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](idx)
          val (w, h, c, f) =
            ImageCodec.decodeMeta(bytes).getOrElse(stubDecode(bytes))
          Row.fromSeq(row.toSeq :+ Row(w, h, c, f))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image resize: decode → bilinear resample to (w, h) → re-encode
    * via [[ImageCodec.resize]], batched per partition. Undecodable payloads
    * yield null (they have no pixels to resample — a pipeline filters or
    * routes them; inventing bytes would hide corruption).
    */
  def resizeTo(
      df: DataFrame,
      bytesCol: String,
      outCol: String,
      width: Int,
      height: Int,
      format: String = "png",
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType, nullable = true)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val out = ImageCodec.resize(row.getAs[Array[Byte]](idx), width, height, format).orNull
        Row.fromSeq(row.toSeq :+ out)
      })
    }(Encoders.row(outSchema))
  }

  /** Perceptual 64-bit difference hash per payload ([[ImageCodec.dHash64]]);
    * null for undecodable bytes. Feed the result to
    * [[graft.dedup.Dedup.nearDupPairsHash64]] for image near-dup at scale —
    * the hash is 8 bytes, so the dedup shuffle never carries pixels.
    */
  def imageDHash(
      df: DataFrame,
      bytesCol: String,
      outCol: String = "dhash",
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(outCol, LongType, nullable = true)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val h = ImageCodec.dHash64(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq :+ h.map(Long.box).orNull)
      })
    }(Encoders.row(outSchema))
  }

  /** Deterministic gray-PNG payload per row ([[ImageCodec.renderGrayPng]] of
    * row-derived seed/size, optionally brightened) — the image-fixture
    * generator for specs and q-entries: real encoded PNGs whose decoded
    * metadata is a pure function of the driving columns, so DuckDB oracle
    * SQL can predict it. NOT part of the production surface.
    */
  def synthGrayImages(
      df: DataFrame,
      seed: org.apache.spark.sql.Column,
      width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column,
      outCol: String = "img_bytes",
      brightenDelta: org.apache.spark.sql.Column = lit(0),
      batchSize: Int = 64,
  ): DataFrame = {
    val tagged = df
      .withColumn("__seed", seed.cast(LongType))
      .withColumn("__w", width.cast(IntegerType))
      .withColumn("__h", height.cast(IntegerType))
      .withColumn("__d", brightenDelta.cast(IntegerType))
    val n         = df.schema.size
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    tagged.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        // render-with-delta + one encode (round 16, guide §1.2): the old
        // shape encoded the base PNG, decoded it back, shifted, and
        // encoded again — brighten(decode(encode(render))) is sample-for-
        // sample equal to rendering with the clamped delta applied, so the
        // payload bytes are identical at a third of the codec work.
        val out = ImageCodec.encodePng(ImageCodec.renderGrayImage(
          row.getLong(n), row.getInt(n + 1), row.getInt(n + 2), delta = row.getInt(n + 3)))
        Row.fromSeq(row.toSeq.take(n) :+ out)
      })
    }(Encoders.row(outSchema))
  }

  /** Typed metadata for an audio payload. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
  ))

  /** REAL audio header decode ([[AudioCodec.decodeMeta]] — RIFF/AIFF
    * preamble only, no PCM touch), batched per partition. Payloads no
    * installed reader claims yield a null struct — audio has no legacy
    * stub to stay compatible with, so honesty wins over totality.
    */
  def decodeAudioMeta(
      df: DataFrame,
      bytesCol: String,
      metaCol: String = "meta",
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(metaCol, audioMetaSchema, nullable = true)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val meta = AudioCodec.decodeMeta(row.getAs[Array[Byte]](idx))
          .map { case (sr, ch, bits, fr, fmt) => Row(sr, ch, bits, fr, fmt) }
          .orNull
        Row.fromSeq(row.toSeq :+ meta)
      })
    }(Encoders.row(outSchema))
  }

  /** Deterministic signal features from a REAL PCM decode: struct(rms,
    * zero_crossings, frames) — the audio-curation primitives (level
    * gating, silence/tone detection). Null struct for undecodable bytes.
    */
  def audioFeatures(
      df: DataFrame,
      bytesCol: String,
      featCol: String = "audio",
      batchSize: Int = 64,
  ): DataFrame = {
    val schema = StructType(Seq(
      StructField("rms", DoubleType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false),
      StructField("frames", LongType, nullable = false),
    ))
    val outSchema = df.schema.add(featCol, schema, nullable = true)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val feats = AudioCodec.decodeSamplesMono(row.getAs[Array[Byte]](idx)).map { s =>
          Row(AudioCodec.rms(s), AudioCodec.zeroCrossings(s), s.length.toLong)
        }.orNull
        Row.fromSeq(row.toSeq :+ feats)
      })
    }(Encoders.row(outSchema))
  }

  /** Deterministic square-wave WAV payload per row
    * ([[AudioCodec.renderSquareWav]] of row-derived period/frames) — the
    * audio-fixture generator: real encoded WAVs whose decoded metadata and
    * features are closed-form in the driving columns, so DuckDB oracle SQL
    * can predict them. NOT part of the production surface.
    */
  def synthSquareWavs(
      df: DataFrame,
      period: org.apache.spark.sql.Column,
      frames: org.apache.spark.sql.Column,
      outCol: String = "wav_bytes",
      sampleRate: Int = 8000,
      batchSize: Int = 64,
  ): DataFrame = {
    val tagged = df
      .withColumn("__p", period.cast(IntegerType))
      .withColumn("__f", frames.cast(IntegerType))
    val n         = df.schema.size
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    tagged.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val wav = AudioCodec.renderSquareWav(row.getInt(n), row.getInt(n + 1), sampleRate)
        Row.fromSeq(row.toSeq.take(n) :+ wav)
      })
    }(Encoders.row(outSchema))
  }

  /** Feature-extraction: binary payload → `dim`-long L2-normalized
    * `array<float>` embedding. STUB — deterministic hash-derived values in
    * place of a vision/audio model forward pass; the batched mapPartitions
    * shape (model loaded once per partition, applied per batch) is the real
    * contract.
    */
  def extractFeatures(
      df: DataFrame,
      bytesCol: String,
      featCol: String = "features",
      dim: Int = 64,
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(featCol, ArrayType(FloatType, containsNull = false), nullable = false)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      // a real impl loads the model HERE — once per partition, not per row
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](idx)
          // STUB forward pass: splitmix64 per dimension, then L2 normalize
          val raw = new Array[Float](dim)
          var seed = bytes.foldLeft(0x9E3779B97F4A7C15L)((a, b) => (a ^ b) * 0x100000001B3L)
          var i = 0
          while (i < dim) {
            seed += 0x9E3779B97F4A7C15L
            var z = seed
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            raw(i) = (((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
            i += 1
          }
          val norm = math.sqrt(raw.foldLeft(0.0)((a, v) => a + v.toDouble * v)).toFloat
          val feats = if (norm == 0f) raw else raw.map(_ / norm)
          Row.fromSeq(row.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Resize: payload → payload'. STUB — truncate/cycle bytes to the target
    * "resolution" (deterministic); a real impl decodes, resamples,
    * re-encodes per batch.
    */
  def resizeImage(
      df: DataFrame,
      bytesCol: String,
      outCol: String,
      targetBytes: Int,
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val out   = new Array[Byte](targetBytes)
        if (bytes.nonEmpty) { var i = 0; while (i < targetBytes) { out(i) = bytes(i % bytes.length); i += 1 } }
        Row.fromSeq(row.toSeq :+ out)
      })
    }(Encoders.row(outSchema))
  }

  /** REAL frame sampling for multi-frame GIF payloads: decode all frames
    * ([[ImageCodec.decodeGifFrames]]), keep `frames` evenly spaced ones
    * (all of them when the clip is shorter), re-encode each as PNG. Null
    * for payloads that aren't GIFs — the honest analog of a video keyframe
    * sampler, on the one multi-frame container the JVM decodes natively.
    * The byte-slicing [[sampleFrames]] stub remains the plumbing contract
    * for containers with no JVM codec (mp4 et al.).
    */
  def sampleGifFrames(
      df: DataFrame,
      bytesCol: String,
      outCol: String = "frames",
      frames: Int = 4,
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(BinaryType, containsNull = false), nullable = true)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val sampled = ImageCodec.decodeGifFrames(row.getAs[Array[Byte]](idx)).map { all =>
          val n = all.length
          val picks =
            if (n <= frames) all.indices
            else (0 until frames).map(f => f * n / frames)
          picks.map(i => ImageCodec.encodePng(all(i)))
        }.orNull
        Row.fromSeq(row.toSeq :+ sampled)
      })
    }(Encoders.row(outSchema))
  }

  /** Deterministic animated-GIF payload per row: `nFrames` gray frames of
    * (width, height), frame i rendered from seed+i — the video-fixture
    * generator (same contract as [[synthGrayImages]]/[[synthSquareWavs]]).
    * NOT part of the production surface.
    */
  def synthAnimatedGifs(
      df: DataFrame,
      seed: org.apache.spark.sql.Column,
      nFrames: org.apache.spark.sql.Column,
      width: Int,
      height: Int,
      outCol: String = "gif_bytes",
      batchSize: Int = 64,
  ): DataFrame = {
    val tagged = df
      .withColumn("__seed", seed.cast(LongType))
      .withColumn("__n", nFrames.cast(IntegerType))
    val n         = df.schema.size
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    tagged.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val s  = row.getLong(n)
        val nf = row.getInt(n + 1)
        // render frames directly as rasters (round 16, guide §1.2): the
        // old shape PNG-encoded each frame and decoded it straight back
        // just to obtain a BufferedImage for the GIF writer — same pixels,
        // same GIF stream, two codec passes fewer per frame.
        val fs = (0 until nf).map(i => ImageCodec.renderGrayImage(s + i, width, height))
        Row.fromSeq(row.toSeq.take(n) :+ ImageCodec.encodeAnimatedGif(fs))
      })
    }(Encoders.row(outSchema))
  }

  /** Frame-sampling: "video" payload → `frames` evenly-spaced frame
    * payloads (`array<binary>`). STUB — slices the byte stream; a real impl
    * seeks keyframes per batch.
    */
  def sampleFrames(
      df: DataFrame,
      bytesCol: String,
      outCol: String = "frames",
      frames: Int = 4,
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(BinaryType, containsNull = false), nullable = false)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val n     = math.max(1, bytes.length / math.max(frames, 1))
        val fs: Seq[Array[Byte]] = (0 until frames).map { f =>
          val start = math.min(f * n, bytes.length)
          java.util.Arrays.copyOfRange(bytes, start, math.min(start + n, bytes.length))
        }
        Row.fromSeq(row.toSeq :+ fs)
      })
    }(Encoders.row(outSchema))
  }

  /** Repartition by cumulative PAYLOAD bytes, not row count — with media
    * columns a "row" is KB–MB, so `spark.sql.files.maxPartitionBytes`-style
    * sizing must look at the binary column. Computes total payload size in
    * one cheap aggregate and repartitions to
    * ceil(totalBytes / targetPartitionBytes) partitions.
    */
  def repartitionForPayload(
      df: DataFrame,
      bytesCol: String,
      targetPartitionBytes: Long = 128L * 1024 * 1024,
  ): DataFrame = {
    val total = df.agg(sum(octet_length(col(bytesCol)))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r                  => r.getLong(0)
    }
    val parts = math.max(1, math.ceil(total.toDouble / targetPartitionBytes).toInt)
    df.repartition(parts)
  }

  /** Per-row 64-bit perceptual audio hash ([[AudioCodec.audioHash64]]):
    * adds `outCol` (nullable long — null for undecodable/too-short
    * payloads, which the hash64 dedup family passes through as survivors).
    */
  def audioHash(
      df: DataFrame,
      bytesCol: String,
      outCol: String = "ahash",
      batchSize: Int = 64,
  ): DataFrame = {
    val outSchema = df.schema.add(outCol, LongType, nullable = true)
    val idx       = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val h = AudioCodec.audioHash64(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq :+ h.map(Long.box).orNull)
      })
    }(Encoders.row(outSchema))
  }

  /** Deterministic pseudo-noise WAV fixture generator (see
    * [[AudioCodec.renderNoiseWav]]).
    */
  def synthNoiseWavs(
      df: DataFrame,
      seed: org.apache.spark.sql.Column,
      frames: org.apache.spark.sql.Column,
      outCol: String = "wav_bytes",
      sampleRate: Int = 8000,
      batchSize: Int = 64,
  ): DataFrame = {
    val tagged = df
      .withColumn("__s", seed.cast(LongType))
      .withColumn("__f", frames.cast(IntegerType))
    val n         = df.schema.size
    val outSchema = df.schema.add(outCol, BinaryType, nullable = false)
    tagged.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val wav = AudioCodec.renderNoiseWav(row.getLong(n), row.getInt(n + 1), sampleRate)
        Row.fromSeq(row.toSeq.take(n) :+ wav)
      })
    }(Encoders.row(outSchema))
  }

  /** Video near-dup pairs via shared sampled-keyframe perceptual hashes —
    * the standard scale recipe for video dedup (sample k frames, hash each,
    * candidate = videos sharing ≥ `minShared` frame hashes): composes
    * [[sampleGifFrames]] + [[imageDHash]] into an EXACT-equality equi-join
    * keyed by the 8-byte hash. Scale shape: the join input is
    * (id, frame_hash) rows only — `sampleFrames` rows per video, payload
    * never joins; corpus-wide hot frames (intros, black frames) are
    * bucket-capped like every LSH join here. Output
    * `(id_a, id_b, shared_frames)`.
    */
  def videoNearDupPairs(
      df: DataFrame,
      idCol: String,
      gifCol: String,
      sampleFrames: Int = 4,
      minShared: Int = 2,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    // fused sample-and-hash (round 16, guide §1.2): composing
    // [[sampleGifFrames]] + [[imageDHash]] PNG-encodes every sampled frame
    // only for the hasher to decode it again — a pure lossless round trip
    // whose hash equals hashing the decoded frame directly. One
    // mapPartitions pass decodes each GIF once, picks the same evenly-
    // spaced frames, and emits (id, dHash) rows; payload bytes never leave
    // the scan task. Non-GIF payloads contribute no frames, exactly as the
    // old null-filtered composition.
    val in = df.select(col(idCol), col(gifCol))
    val hashSchema = StructType(Seq(in.schema.head,
      StructField("fh", LongType, nullable = false)))
    val hashed = in.mapPartitions { it =>
      it.flatMap { row =>
        ImageCodec.decodeGifFrames(row.getAs[Array[Byte]](1)) match {
          case Some(all) =>
            val n = all.length
            val picks =
              if (n <= sampleFrames) all.indices
              else (0 until sampleFrames).map(f => f * n / sampleFrames)
            picks.map(i => Row(row.get(0), ImageCodec.dHash64Image(all(i))))
          case None => Nil
        }
      }
    }(Encoders.row(hashSchema))
    // >= 2: a frame hash seen once can share nothing — output-free filter
    // that removes the singleton majority before the pair join (round 16)
    val capped = hashed.withColumn("__bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("fh"))))
      .where(col("__bsz") <= maxBucketSize && col("__bsz") >= 2).drop("__bsz")
    val a = capped.select(col(idCol).as("id_a"), col("fh"))
    val b = capped.select(col(idCol).as("id_b"), col("fh"))
    a.join(b, Seq("fh")).where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(col("fh")).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
  }
}
