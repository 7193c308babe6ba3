package graft.multimodal

import java.awt.image.{BufferedImage, DataBufferByte}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal spec-conformant PNG writer/reader for the one shape that
  * dominates this pipeline's media fixtures and gray-thumbnail corpora:
  * 8-bit single-band grayscale, non-interlaced (round 16, guide §1.2 —
  * per-image codec cost is the hot path of q89/q90/q91/q96/q100/q118/q119).
  *
  * Why not ImageIO: the JDK writer/reader pays per call for plugin-registry
  * lookup, stream adapters, metadata plumbing and a conservative deflate
  * level; for a 32×24 gray tile that overhead is ~10× the actual pixel
  * work. This class writes IHDR/IDAT/IEND with filter 0 rows and
  * BEST_SPEED deflate, and reads exactly that shape back (all five PNG row
  * filters supported, since foreign gray PNGs may use them).
  *
  * Correctness contract: PNG is lossless and its decode is deterministic,
  * so pixels — and everything derived from them (dHash, decoded metadata,
  * resampling, the DuckDB oracles) — are identical whichever codec
  * produced or parsed the stream. The compressed bytes themselves differ
  * from ImageIO's output (smaller/faster), which nothing in the repo or
  * the oracle surface depends on. Non-matching payloads (RGB, 16-bit,
  * interlaced, palette, ancillary-chunk-bearing) return None / fall back
  * to ImageIO at the call sites.
  */
private[multimodal] object FastGrayPng {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** Encode a TYPE_BYTE_GRAY image as a grayscale PNG. */
  def encode(img: BufferedImage): Array[Byte] = {
    require(img.getType == BufferedImage.TYPE_BYTE_GRAY, "fast path is byte-gray only")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    // raw scanlines: one filter byte (0 = None) + w samples per row
    val raw = new Array[Byte]((w + 1) * h)
    val db = raster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    val sm = raster.getSampleModel.asInstanceOf[java.awt.image.ComponentSampleModel]
    val stride = sm.getScanlineStride
    val base = sm.getOffset(raster.getMinX - raster.getSampleModelTranslateX,
      raster.getMinY - raster.getSampleModelTranslateY)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0
      System.arraycopy(db, base + y * stride, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream(comp.size() + 64)
    out.write(SIG, 0, SIG.length)
    val ihdr = new Array[Byte](13)
    putInt(ihdr, 0, w); putInt(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // compression 0, filter 0, interlace 0 already zero
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", comp.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit gray non-interlaced PNG carrying only IHDR/IDAT/IEND
    * chunks (exactly what [[encode]] writes). Anything else → None, so the
    * caller falls back to the full ImageIO reader.
    */
  def decode(bytes: Array[Byte]): Option[BufferedImage] = {
    if (bytes == null || bytes.length < 45) return None
    var i = 0
    while (i < 8) { if (bytes(i) != SIG(i)) return None; i += 1 }
    try {
      // IHDR must be first — and its CRC must verify (round 17, ADVICE
      // r16): ImageIO rejects corrupted streams, so the fast path must not
      // silently return garbage pixels where the fallback returned None.
      if (readInt(bytes, 8) != 13 || !chunkType(bytes, 12).equals("IHDR")) return None
      if (!crcOk(bytes, 12, 13)) return None
      val w = readInt(bytes, 16)
      val h = readInt(bytes, 20)
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      val depth = bytes(24); val color = bytes(25); val interlace = bytes(28)
      if (depth != 8 || color != 0 || interlace != 0) return None
      // walk chunks: accept IDAT(s) + IEND only, each CRC-verified
      val idat = new java.io.ByteArrayOutputStream(bytes.length)
      var pos = 8 + 12 + 13
      var ended = false
      while (!ended) {
        if (pos + 8 > bytes.length) return None
        val len = readInt(bytes, pos)
        val typ = chunkType(bytes, pos + 4)
        if (len < 0 || pos + 12L + len > bytes.length) return None
        if (!crcOk(bytes, pos + 4, len)) return None
        typ match {
          case "IDAT" => idat.write(bytes, pos + 8, len)
          case "IEND" => ended = true
          case _      => return None // ancillary chunk — let ImageIO handle it
        }
        pos += 12 + len
      }
      val raw = new Array[Byte]((w + 1) * h)
      val inflater = new Inflater()
      // try/finally (round 17, ADVICE r16): the early-return/throw paths
      // previously leaked the Inflater's native memory until finalization
      var off = 0
      try {
        inflater.setInput(idat.toByteArray)
        while (off < raw.length && !inflater.finished()) {
          val k = inflater.inflate(raw, off, raw.length - off)
          if (k == 0 && inflater.needsInput()) return None // truncated stream
          off += k
        }
      } finally inflater.end()
      if (off != raw.length) return None
      // unfilter in place into the output raster
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val out = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
      var y = 0
      while (y < h) {
        val f = raw(y * (w + 1))
        val src = y * (w + 1) + 1
        val dst = y * w
        f match {
          case 0 => System.arraycopy(raw, src, out, dst, w)
          case 1 => // Sub
            var x = 0
            var left = 0
            while (x < w) {
              left = (raw(src + x) + left) & 0xFF; out(dst + x) = left.toByte; x += 1
            }
          case 2 => // Up
            var x = 0
            while (x < w) {
              val up = if (y == 0) 0 else out(dst - w + x) & 0xFF
              out(dst + x) = ((raw(src + x) + up) & 0xFF).toByte; x += 1
            }
          case 3 => // Average
            var x = 0
            while (x < w) {
              val left = if (x == 0) 0 else out(dst + x - 1) & 0xFF
              val up   = if (y == 0) 0 else out(dst - w + x) & 0xFF
              out(dst + x) = ((raw(src + x) + ((left + up) >> 1)) & 0xFF).toByte; x += 1
            }
          case 4 => // Paeth
            var x = 0
            while (x < w) {
              val a = if (x == 0) 0 else out(dst + x - 1) & 0xFF
              val b = if (y == 0) 0 else out(dst - w + x) & 0xFF
              val c = if (x == 0 || y == 0) 0 else out(dst - w + x - 1) & 0xFF
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              out(dst + x) = ((raw(src + x) + pred) & 0xFF).toByte; x += 1
            }
          case _ => return None
        }
        y += 1
      }
      Some(img)
    } catch { case _: Exception => None }
  }

  private def putInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  /** CRC32 over type+data (starting at `typOff`, data length `len`) vs the
    * stored chunk CRC — one cheap pass, what the spec demands of readers.
    */
  private def crcOk(a: Array[Byte], typOff: Int, len: Int): Boolean = {
    val crc = new CRC32()
    crc.update(a, typOff, 4 + len)
    crc.getValue.toInt == readInt(a, typOff + 4 + len)
  }

  private def readInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xFF) << 24) | ((a(off + 1) & 0xFF) << 16) |
      ((a(off + 2) & 0xFF) << 8) | (a(off + 3) & 0xFF)

  private def chunkType(a: Array[Byte], off: Int): String =
    new String(a, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val lenB = new Array[Byte](4); putInt(lenB, 0, data.length)
    out.write(lenB, 0, 4)
    val typB = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(typB, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(typB); crc.update(data)
    val crcB = new Array[Byte](4); putInt(crcB, 0, crc.getValue.toInt)
    out.write(crcB, 0, 4)
  }
}
