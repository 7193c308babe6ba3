package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Legacy Excel 97-2003 (`.xls`) reader with no external dependencies: a
  * minimal CFB (OLE2 compound file, MS-CFB) walker + BIFF8 record parser
  * (MS-XLS). Closes the reference's `.xls` surface
  * (python-sdk/src/astro/files/types/xls.py reads it via pandas/xlrd).
  *
  * Driver-side by design, like [[Xlsx]]: spreadsheets are a small-file
  * on-ramp, not a bulk path; the parsed rows become a normal distributed
  * DataFrame immediately.
  *
  * Supported: sheet selection by workbook (BOUNDSHEET) order index or by
  * name, pandas `sheet_name` parity; SST/LABELSST shared strings (compressed +
  * UTF-16, CONTINUE-spanning), LABEL inline strings, NUMBER/RK/MULRK
  * numerics, BLANK/MULBLANK, FORMULA cached numeric/string/boolean
  * results. Mini-stream (< 4096-byte workbook) and regular FAT chains both
  * handled.
  */
object Xls {

  // ---------- public API ----------

  def read(spark: SparkSession, path: String, sheet: SheetRef = SheetRef.First): DataFrame = {
    val p    = new org.apache.hadoop.fs.Path(path)
    val fs   = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in   = fs.open(p)
    val bytes =
      try in.readAllBytes()
      finally in.close()
    val cells =
      try parseWorkbook(bytes, path, sheet)
      catch {
        case e: SheetNotFoundException => throw e
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"$path: corrupt or unsupported legacy Excel 97-2003 (.xls/BIFF) " +
              s"workbook - re-save as .xlsx if the file opens in a spreadsheet " +
              s"application ($e)", e)
      }
    SheetGrid.toDataFrame(spark, cells, path)
  }

  /** Parse the workbook into a dense row-major cell grid (None = blank). */
  private[sources] def parseWorkbook(
      bytes: Array[Byte], path: String,
      sheet: SheetRef = SheetRef.First): Seq[Seq[Option[String]]] = {
    val wb = extractStream(bytes, Set("Workbook", "Book"))
      .getOrElse(throw new IllegalArgumentException(
        s"$path: no Workbook/Book stream in OLE2 container - not an Excel file?"))
    parseBiff(wb, sheet, path)
  }

  // ---------- write (BIFF8 in a regular-FAT CFB container) ----------

  /** Write `df` as a single-sheet Excel 97-2003 workbook — the `.xls`
    * counterpart of [[Xlsx.write]] (reference writes both via pandas
    * `to_excel`: python-sdk/src/astro/files/types/excel.py:42-48). Strings
    * become inline LABEL records (UTF-16, so any BMP text survives),
    * numerics NUMBER records; null → blank. Same driver-side bounded-use
    * contract as the xlsx writer.
    */
  def write(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val grid = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var rowIdx = 0
    def addRow(values: Seq[Any]): Unit = {
      // the format's own hard limits — exceeding them would silently wrap
      // the 16-bit row / 8-bit-era column indices and corrupt earlier cells
      require(rowIdx <= 65535,
        ".xls holds at most 65536 rows (incl. header) - export to csv/parquet/xlsx instead")
      require(values.length <= 256, ".xls holds at most 256 columns")
      values.zipWithIndex.foreach { case (v, c) =>
        v match {
          case null => ()
          case n: Byte => grid += numberRec(rowIdx, c, n.toDouble)
          case n: Short => grid += numberRec(rowIdx, c, n.toDouble)
          case n: Int => grid += numberRec(rowIdx, c, n.toDouble)
          case n: Long => grid += numberRec(rowIdx, c, n.toDouble)
          case n: Float => grid += numberRec(rowIdx, c, n.toDouble)
          case n: Double => grid += numberRec(rowIdx, c, n)
          // IEEE double is BIFF's only numeric cell encoding (NUMBER/RK),
          // so decimals beyond ~15 significant digits round here — the same
          // conversion pandas/xlwt applies; use xlsx/parquet to keep digits
          case n: java.math.BigDecimal => grid += numberRec(rowIdx, c, n.doubleValue)
          case other => grid += labelRec(rowIdx, c, other.toString)
        }
      }
      rowIdx += 1
    }
    addRow(df.columns.toSeq)
    // driver-side single-file contract: bounded result sets only
    df.toLocalIterator().forEachRemaining(r => addRow(r.toSeq))

    val p   = new org.apache.hadoop.fs.Path(path)
    val fs  = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(cfbRegular(biffStream(grid.toSeq, rowIdx, df.columns.length)))
    finally out.close()
  }

  private def le16b(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32b(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def record(id: Int, payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= 8224, s"BIFF record too large (${payload.length} bytes)")
    le16b(id) ++ le16b(payload.length) ++ payload
  }

  /** Default cell XF index — globals emit the customary 15 style XFs + 1
    * cell XF (what xlwt does), and every cell references the cell XF.
    */
  private val CellXf = 15

  private def numberRec(row: Int, c: Int, d: Double): Array[Byte] =
    record(Rec.NUMBER, le16b(row) ++ le16b(c) ++ le16b(CellXf) ++
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array())

  private def labelRec(row: Int, c: Int, s: String): Array[Byte] = {
    // MS-XLS bounds the Label record's string at 255 chars (longer strings
    // require the SST/LABELSST + CONTINUE machinery); .xls is a small-data
    // on-ramp, so fail loudly rather than emit an out-of-spec record
    require(s.length <= 255,
      s"cell string of ${s.length} chars exceeds the .xls Label record's " +
        "255-char spec limit - export to csv/parquet/xlsx instead")
    record(Rec.LABEL, le16b(row) ++ le16b(c) ++ le16b(CellXf) ++ le16b(s.length) ++
      Array[Byte](1) ++ s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
  }

  /** Workbook globals (BOF, CODEPAGE, WINDOW1, FONT, the customary 16 XFs,
    * BOUNDSHEET with patched sheet offset, EOF) + one worksheet substream
    * (BOF, DIMENSION, WINDOW2, cells, EOF). The structural records match
    * what minimal writers like xlwt emit so external consumers
    * (Excel/xlrd/pandas) accept the file; this engine's reader skips them.
    */
  private def biffStream(cellRecords: Seq[Array[Byte]], nRows: Int, nCols: Int): Array[Byte] = {
    val bofGlobals = record(Rec.BOF, le16b(0x0600) ++ le16b(0x0005) ++ new Array[Byte](12))
    val bofSheet   = record(Rec.BOF, le16b(0x0600) ++ le16b(0x0010) ++ new Array[Byte](12))
    val eof        = record(Rec.EOF, Array.empty)
    val codepage   = record(0x0042, le16b(0x04B0)) // UTF-16
    val window1    = record(0x003D, le16b(0) ++ le16b(0) ++ le16b(0x4000) ++ le16b(0x2000) ++
      le16b(0x0038) ++ le16b(0) ++ le16b(0) ++ le16b(1) ++ le16b(600))
    val fontName = "Arial"
    val font = record(0x0031, le16b(200) ++ le16b(0) ++ le16b(0x7FFF) ++ le16b(400) ++
      le16b(0) ++ Array[Byte](0, 0, 0, 0) ++
      Array(fontName.length.toByte, 0.toByte) ++ fontName.map(_.toByte).toArray)
    // 15 style XFs (parent 0xFFF | fStyle) + 1 default cell XF (index 15)
    val xfs = (0 until 16).toArray.flatMap { i =>
      val flags = if (i < CellXf) 0xFFF5 else 0x0001
      record(0x00E0, le16b(0) ++ le16b(0) ++ le16b(flags) ++ new Array[Byte](14))
    }
    val name       = "Sheet1"
    val boundsheet = record(Rec.BOUNDSHEET, le32b(0) ++ le16b(0) ++
      Array(name.length.toByte, 0.toByte) ++ name.map(_.toByte).toArray)
    val dimension = record(0x0200, le32b(0) ++ le32b(nRows) ++ le16b(0) ++ le16b(nCols) ++ le16b(0))
    val window2 = record(0x023E, le16b(0x02B6) ++ le16b(0) ++ le16b(0) ++ le32b(0x40) ++
      le16b(0) ++ le16b(0) ++ le32b(0))
    val globals = bofGlobals ++ codepage ++ window1 ++ font ++ xfs ++ boundsheet ++ eof
    val sheet   = bofSheet ++ dimension ++ window2 ++ cellRecords.flatten.toArray ++ eof
    val outBytes = globals ++ sheet
    val bsOffset = bofGlobals.length + codepage.length + window1.length + font.length + xfs.length
    System.arraycopy(le32b(globals.length), 0, outBytes, bsOffset + 4, 4)
    outBytes
  }

  /** Minimal spec-conformant CFB: sectors 0..g-1 = DIFAT chain (only when
    * the FAT outgrows the 109 header slots), g..g+f-1 = FAT, g+f =
    * directory, g+f+1.. = the workbook stream, zero-padded past the
    * 4096-byte mini cutoff so the regular FAT chain is the correct (and
    * only) location. FAT and DIFAT sector counts are solved together for
    * the stream size, so capacity is bounded by the format (65536 rows ×
    * 256 cols), not the container.
    */
  private def cfbRegular(stream: Array[Byte]): Array[Byte] = {
    def pad(b: Array[Byte], to: Int): Array[Byte] =
      if (b.length % to == 0 && b.length > 0) b
      else b ++ new Array[Byte]((to - b.length % to) % to)
    val padded = pad(stream ++ new Array[Byte](math.max(0, 4096 - stream.length)), 512)
    val d      = padded.length / 512
    // smallest (f, g): 128·f FAT entries cover g DIFAT + f FAT + 1 dir + d
    // data sectors, with DIFAT sectors (127 FAT ids + next pointer each)
    // for every FAT sector past the 109 header slots
    var f = 1
    var g = 0
    var settled = false
    while (!settled) {
      g = math.max(0, math.ceil((f - 109) / 127.0).toInt)
      if (128 * f < g + f + 1 + d) f += 1 else settled = true
    }
    val dirSect  = g + f
    val dataSect = g + f + 1
    val entries  = Array.fill(128 * f)(FreeSect)
    for (i <- 0 until g) entries(i) = 0xFFFFFFFC // DIFSECT
    for (i <- 0 until f) entries(g + i) = 0xFFFFFFFD // FATSECT
    entries(dirSect) = EndOfChain
    for (j <- 0 until d)
      entries(dataSect + j) = if (j == d - 1) EndOfChain else dataSect + j + 1
    val fat = entries.flatMap(le32b)
    val difat = (0 until g).toArray.flatMap { i =>
      val s = new Array[Byte](512)
      for (k <- 0 until 127) {
        val fatIdx = 109 + i * 127 + k
        System.arraycopy(le32b(if (fatIdx < f) g + fatIdx else FreeSect), 0, s, k * 4, 4)
      }
      System.arraycopy(le32b(if (i == g - 1) EndOfChain else i + 1), 0, s, 508, 4)
      s
    }

    def dirEntry(name: String, entryType: Int, start: Int, size: Int, child: Int): Array[Byte] = {
      val e  = new Array[Byte](128)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      System.arraycopy(nb, 0, e, 0, nb.length)
      System.arraycopy(le16b(nb.length + 2), 0, e, 64, 2)
      e(66) = entryType.toByte
      e(67) = 1
      System.arraycopy(le32b(-1), 0, e, 68, 4)
      System.arraycopy(le32b(-1), 0, e, 72, 4)
      System.arraycopy(le32b(child), 0, e, 76, 4)
      System.arraycopy(le32b(start), 0, e, 116, 4)
      System.arraycopy(le32b(size), 0, e, 120, 4)
      e
    }
    val dir = pad(dirEntry("Root Entry", 5, EndOfChain, 0, child = 1) ++
      dirEntry("Workbook", 2, dataSect, padded.length, child = -1), 512)
    val header = {
      val h = new Array[Byte](512)
      val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
      System.arraycopy(magic, 0, h, 0, 8)
      System.arraycopy(le16b(0x003E), 0, h, 24, 2)
      System.arraycopy(le16b(0x0003), 0, h, 26, 2)
      System.arraycopy(le16b(0xFFFE), 0, h, 28, 2)
      System.arraycopy(le16b(9), 0, h, 30, 2)
      System.arraycopy(le16b(6), 0, h, 32, 2)
      System.arraycopy(le32b(f), 0, h, 44, 4)       // FAT sector count
      System.arraycopy(le32b(dirSect), 0, h, 48, 4) // directory sector
      System.arraycopy(le32b(4096), 0, h, 56, 4)    // mini cutoff
      System.arraycopy(le32b(EndOfChain), 0, h, 60, 4) // no miniFAT
      System.arraycopy(le32b(0), 0, h, 64, 4)
      System.arraycopy(le32b(if (g == 0) EndOfChain else 0), 0, h, 68, 4)
      System.arraycopy(le32b(g), 0, h, 72, 4)
      for (i <- 0 until 109)
        System.arraycopy(le32b(if (i < f) g + i else FreeSect), 0, h, 76 + i * 4, 4)
      h
    }
    header ++ difat ++ fat ++ dir ++ padded
  }

  // ---------- CFB container (MS-CFB) ----------

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect   = 0xFFFFFFFF

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  /** Find a stream by name (first match wins) and return its bytes. */
  private def extractStream(b: Array[Byte], names: Set[String]): Option[Array[Byte]] = {
    require(b.length >= 512 &&
      (b(0) & 0xFF) == 0xD0 && (b(1) & 0xFF) == 0xCF && (b(2) & 0xFF) == 0x11 &&
      (b(3) & 0xFF) == 0xE0, "not an OLE2 compound file")
    val sectorShift     = u16(b, 30)
    val miniSectorShift = u16(b, 32)
    require(sectorShift >= 7 && sectorShift <= 12 && miniSectorShift <= sectorShift,
      s"implausible OLE2 sector sizes (shift $sectorShift/$miniSectorShift) - corrupt header?")
    val sectorSize      = 1 << sectorShift
    val miniSectorSize  = 1 << miniSectorShift
    val numFatSectors   = i32(b, 44)
    val firstDirSector  = i32(b, 48)
    val miniCutoff      = i32(b, 56)
    val firstMiniFat    = i32(b, 60)
    val firstDifat      = i32(b, 68)
    val numDifat        = i32(b, 72)

    def sectorBytes(sect: Int): Array[Byte] = {
      val off = 512 + sect.toLong * sectorSize
      require(off + sectorSize <= b.length, s"sector $sect out of range")
      java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + sectorSize)
    }

    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    val fatSectors = mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < 109 && fatSectors.length < numFatSectors) {
      val s = i32(b, 76 + i * 4)
      if (s != FreeSect) fatSectors += s
      i += 1
    }
    var difat  = firstDifat
    var guard1 = 0
    while (difat != EndOfChain && difat != FreeSect && guard1 <= numDifat) {
      val ds      = sectorBytes(difat)
      val perSect = sectorSize / 4 - 1
      for (j <- 0 until perSect) {
        val s = i32(ds, j * 4)
        if (s != FreeSect && fatSectors.length < numFatSectors) fatSectors += s
      }
      difat = i32(ds, sectorSize - 4)
      guard1 += 1
    }
    val fat = fatSectors.toArray.flatMap { s =>
      val sb = sectorBytes(s)
      (0 until sectorSize / 4).map(j => i32(sb, j * 4))
    }

    def chain(start: Int): Iterator[Int] = new Iterator[Int] {
      private var cur  = start
      private var seen = 0
      def hasNext: Boolean = cur != EndOfChain && cur != FreeSect && cur >= 0 &&
        seen <= fat.length
      def next(): Int = { val c = cur; cur = fat(c); seen += 1; c }
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start).foreach(s => out.write(sectorBytes(s)))
      val all = out.toByteArray
      java.util.Arrays.copyOfRange(all, 0, math.min(size, all.length.toLong).toInt)
    }

    // directory entries (128 bytes each) across the directory chain
    val dirBytes = {
      val out = new java.io.ByteArrayOutputStream()
      chain(firstDirSector).foreach(s => out.write(sectorBytes(s)))
      out.toByteArray
    }
    case class Entry(name: String, entryType: Int, start: Int, size: Long)
    val entries = (0 until dirBytes.length / 128).map { e =>
      val off     = e * 128
      val nameLen = u16(dirBytes, off + 64) // bytes incl. UTF-16 terminator
      val name =
        if (nameLen >= 2)
          new String(dirBytes, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
      Entry(name, dirBytes(off + 66) & 0xFF, i32(dirBytes, off + 116),
        i32(dirBytes, off + 120).toLong & 0xFFFFFFFFL)
    }

    val root = entries.find(_.entryType == 5)
    entries.find(e => e.entryType == 2 && names.contains(e.name)).map { e =>
      if (e.size >= miniCutoff || root.isEmpty) readChain(e.start, e.size)
      else {
        // mini stream: the root entry's regular chain holds the container;
        // the miniFAT chains 64-byte mini sectors inside it
        val container = readChain(root.get.start, root.get.size)
        val miniFat = {
          val out = new java.io.ByteArrayOutputStream()
          chain(firstMiniFat).foreach(s => out.write(sectorBytes(s)))
          val mb = out.toByteArray
          (0 until mb.length / 4).map(j => i32(mb, j * 4)).toArray
        }
        val out  = new java.io.ByteArrayOutputStream()
        var cur  = e.start
        var seen = 0
        while (cur != EndOfChain && cur != FreeSect && cur >= 0 && seen <= miniFat.length) {
          val off = cur * miniSectorSize
          out.write(container, off, math.min(miniSectorSize, container.length - off))
          cur = miniFat(cur)
          seen += 1
        }
        java.util.Arrays.copyOfRange(out.toByteArray, 0, e.size.toInt)
      }
    }
  }

  // ---------- BIFF8 records (MS-XLS) ----------

  private object Rec {
    val BOF        = 0x0809
    val EOF        = 0x000A
    val BOUNDSHEET = 0x0085
    val SST        = 0x00FC
    val CONTINUE   = 0x003C
    val LABELSST   = 0x00FD
    val LABEL      = 0x0204
    val NUMBER     = 0x0203
    val RK         = 0x027E
    val MULRK      = 0x00BD
    val BLANK      = 0x0201
    val MULBLANK   = 0x00BE
    val FORMULA    = 0x0006
    val STRING     = 0x0207
    val RSTRING    = 0x00D6
  }

  /** RK-encoded number (MS-XLS 2.5.276): 30-bit int or truncated double,
    * optionally ×1/100.
    */
  private[graft] def decodeRk(rk: Int): Double = {
    val x100 = (rk & 1) != 0
    val v =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (x100) v / 100 else v
  }

  /** Render a cell double the way the xlsx path renders `<v>` text: integral
    * values print without the trailing `.0` so column-type inference sees
    * longs (BIFF stores every number as double/RK).
    */
  private def numToString(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite && math.abs(d) < 9.007199254740992e15)
      d.toLong.toString
    else d.toString

  /** A cursor over the record stream that transparently continues into
    * CONTINUE records — SST payloads regularly span several.
    */
  private final class RecCursor(b: Array[Byte], var pos: Int, var remaining: Int) {
    def continueIfNeeded(): Unit = {
      while (remaining == 0 && pos + 4 <= b.length && u16(b, pos) == Rec.CONTINUE) {
        remaining = u16(b, pos + 2)
        pos += 4
      }
      // exhausted with no CONTINUE next = truncated/corrupt input; failing
      // here (caught and wrapped by read()) beats spinning forever
      require(remaining > 0, "record data truncated (no CONTINUE record follows)")
    }
    def atContinueBoundary: Boolean = remaining == 0
    def u8(): Int = { continueIfNeeded(); val v = b(pos) & 0xFF; pos += 1; remaining -= 1; v }
    def u16v(): Int = u8() | (u8() << 8)
    def i32v(): Int = u16v() | (u16v() << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        continueIfNeeded()
        val take = math.min(left, remaining)
        pos += take; remaining -= take; left -= take
      }
    }
  }

  /** XLUnicodeRichExtendedString (MS-XLS 2.5.293): cch chars whose width can
    * RESET at each CONTINUE boundary (a fresh grbit byte precedes the
    * continued characters).
    */
  private def readUnicodeString(c: RecCursor, cch: Int): String = {
    var flags   = c.u8()
    val rich    = (flags & 0x08) != 0
    val ext     = (flags & 0x04) != 0
    val cRun    = if (rich) c.u16v() else 0
    val cbExt   = if (ext) c.i32v() else 0
    val sb      = new java.lang.StringBuilder(cch)
    var read    = 0
    var wide    = (flags & 0x01) != 0
    while (read < cch) {
      if (c.atContinueBoundary) {
        c.continueIfNeeded()
        wide = (c.u8() & 0x01) != 0 // grbit repeats after the boundary
      }
      if (wide) sb.append(c.u16v().toChar)
      else sb.append((c.u8() & 0xFF).toChar) // compressed = Latin-1 low bytes
      read += 1
    }
    c.skip(cRun * 4 + cbExt)
    sb.toString
  }

  /** Parse the workbook stream: globals substream (SST, BOUNDSHEETs in
    * workbook order) then the SELECTED worksheet substream's cell records
    * into a dense grid.
    */
  private def parseBiff(
      wb: Array[Byte], sheet: SheetRef, path: String): Seq[Seq[Option[String]]] = {
    val sst = mutable.ArrayBuffer[String]()
    // BOUNDSHEET order IS the workbook sheet order (MS-XLS 2.4.28); each
    // record carries the substream offset and the sheet name
    val boundsheets = mutable.ArrayBuffer[(String, Int)]()

    // --- pass 1: workbook globals ---
    var pos = 0
    var done = false
    while (!done && pos + 4 <= wb.length) {
      val id  = u16(wb, pos)
      val len = u16(wb, pos + 2)
      id match {
        case Rec.SST =>
          val c = new RecCursor(wb, pos + 4, len)
          c.skip(4) // cstTotal
          val unique = c.i32v()
          var k = 0
          while (k < unique) {
            val cch = c.u16v()
            sst += readUnicodeString(c, cch)
            k += 1
          }
        case Rec.BOUNDSHEET =>
          // lbPlyPos(4) grbit(2) cch(1) flags(1) name[cch or 2*cch]
          val off   = i32(wb, pos + 4)
          val cch   = wb(pos + 10) & 0xFF
          val flags = wb(pos + 11) & 0xFF
          val name =
            if ((flags & 1) != 0)
              new String(wb, pos + 12, 2 * cch, java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(wb, pos + 12, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
          boundsheets += (name -> off)
        case Rec.EOF => done = true
        case 0 if len == 0 => done = true // zero padding past the stream end
        case _ => ()
      }
      pos += 4 + len
    }
    require(boundsheets.nonEmpty, "no worksheet substream in workbook globals")
    val sheetOffset = SheetRef.select(boundsheets.toSeq, sheet, path)
    require(sheetOffset >= 0 && sheetOffset < wb.length,
      s"worksheet substream offset $sheetOffset out of bounds")

    // --- pass 2: selected worksheet substream ---
    val cells = mutable.HashMap[(Int, Int), String]() // (row, col) -> value
    var maxRow = -1
    var maxCol = -1
    def put(row: Int, col: Int, v: String): Unit = {
      cells((row, col)) = v
      if (row > maxRow) maxRow = row
      if (col > maxCol) maxCol = col
    }

    pos = sheetOffset
    done = false
    var sawBof = false
    while (!done && pos + 4 <= wb.length) {
      val id  = u16(wb, pos)
      val len = u16(wb, pos + 2)
      id match {
        case Rec.BOF =>
          if (sawBof) done = true // ran into the next substream
          else sawBof = true
        case Rec.EOF => done = true
        case 0 if len == 0 => done = true
        case Rec.LABELSST =>
          val row = u16(wb, pos + 4); val col = u16(wb, pos + 6)
          val idx = i32(wb, pos + 10)
          put(row, col, sst(idx))
        case Rec.LABEL | Rec.RSTRING =>
          val row = u16(wb, pos + 4); val col = u16(wb, pos + 6)
          val c   = new RecCursor(wb, pos + 10, len - 6)
          val cch = c.u16v()
          put(row, col, readUnicodeString(c, cch))
        case Rec.NUMBER =>
          val row = u16(wb, pos + 4); val col = u16(wb, pos + 6)
          val d = ByteBuffer.wrap(wb, pos + 10, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble
          put(row, col, numToString(d))
        case Rec.RK =>
          val row = u16(wb, pos + 4); val col = u16(wb, pos + 6)
          put(row, col, numToString(decodeRk(i32(wb, pos + 10))))
        case Rec.MULRK =>
          val row = u16(wb, pos + 4); val colFirst = u16(wb, pos + 6)
          val n = (len - 6) / 6
          // payload: rw(2) colFirst(2) then n × [ixfe(2) rk(4)], colLast(2)
          for (j <- 0 until n)
            put(row, colFirst + j, numToString(decodeRk(i32(wb, pos + 10 + j * 6))))
        case Rec.FORMULA =>
          val row = u16(wb, pos + 4); val col = u16(wb, pos + 6)
          val res = java.util.Arrays.copyOfRange(wb, pos + 10, pos + 18)
          if (u16(res, 6) != 0xFFFF) {
            val d = ByteBuffer.wrap(res).order(ByteOrder.LITTLE_ENDIAN).getDouble
            put(row, col, numToString(d))
          } else res(0) match {
            case 0 =>
              // cached string: in the STRING record that follows, at most a
              // couple of records ahead (SHRFMLA/ARRAY may sit between). A
              // bounded scan that stops at EOF/BOF keeps a corrupt file from
              // binding some far-away cell's string — blank beats wrong.
              var p2   = pos + 4 + len
              var hops = 0
              while (hops < 4 && p2 + 4 <= wb.length &&
                u16(wb, p2) != Rec.STRING && u16(wb, p2) != Rec.EOF &&
                u16(wb, p2) != Rec.BOF) { p2 += 4 + u16(wb, p2 + 2); hops += 1 }
              if (p2 + 4 <= wb.length && u16(wb, p2) == Rec.STRING) {
                val c   = new RecCursor(wb, p2 + 4, u16(wb, p2 + 2))
                val cch = c.u16v()
                put(row, col, readUnicodeString(c, cch))
              }
            case 1 => put(row, col, if (res(2) != 0) "true" else "false")
            case _ => () // error cell -> blank
          }
        case _ => ()
      }
      pos += 4 + len
    }

    (0 to maxRow).map(r => (0 to maxCol).map(cc => cells.get((r, cc))))
  }

}

/** Shared header+cells grid → DataFrame assembly for BOTH spreadsheet
  * codecs ([[Xls]] and [[Xlsx]]): first row = header; column types inferred
  * long/double/string over the non-blank values; blank → null. One
  * implementation so the xls/xlsx inference contract cannot drift.
  */
private[sources] object SheetGrid {

  def toDataFrame(
      spark: SparkSession, grid: Seq[Seq[Option[String]]], path: String): DataFrame = {
    require(grid.nonEmpty, s"empty worksheet in $path")
    val header = grid.head.map(_.getOrElse(""))
    val data   = grid.tail
    val width  = header.length
    def colValues(i: Int) = data.map(r => if (i < r.length) r(i) else None)
    val types: Seq[DataType] = (0 until width).map { i =>
      val vs = colValues(i).flatten
      if (vs.nonEmpty && vs.forall(v => scala.util.Try(v.toLong).isSuccess)) LongType
      else if (vs.nonEmpty && vs.forall(v => scala.util.Try(v.toDouble).isSuccess)) DoubleType
      else StringType
    }
    val schema = StructType(header.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val rows = data.map { r =>
      Row.fromSeq((0 until width).map { i =>
        val v = if (i < r.length) r(i) else None
        (v, types(i)) match {
          case (None, _)             => null
          case (Some(s), LongType)   => s.toLong
          case (Some(s), DoubleType) => s.toDouble
          case (Some(s), _)          => s
        }
      })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }
}
