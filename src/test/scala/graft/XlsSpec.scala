package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.sources.{SheetNotFoundException, SheetRef, Xls}

/** BIFF8/.xls reader tests over handcrafted workbooks: the builder below
  * writes minimal-but-spec-conformant CFB containers (MS-CFB) holding BIFF8
  * record streams (MS-XLS) — both the regular-FAT layout (stream >= 4096
  * bytes) and the mini-stream layout (stream < 4096, chained through the
  * miniFAT inside the root entry's storage).
  */
class XlsSpec extends SparkSpec {
  import spark.implicits._

  // ---------- little-endian byte builders ----------

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le64d(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(payload.length) ++ payload

  // ---------- BIFF8 workbook stream ----------

  private def sstString(s: String, wide: Boolean = false): Array[Byte] = {
    val chars =
      if (wide) s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      else s.map(_.toByte).toArray
    le16(s.length) ++ Array[Byte](if (wide) 1 else 0) ++ chars
  }

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0x00FD, le16(row) ++ le16(col) ++ le16(0) ++ le32(isst))
  private def number(row: Int, col: Int, d: Double): Array[Byte] =
    rec(0x0203, le16(row) ++ le16(col) ++ le16(0) ++ le64d(d))
  private def rkInt(v: Int, x100: Boolean = false): Int =
    (v << 2) | 2 | (if (x100) 1 else 0)
  private def rkCell(row: Int, col: Int, rk: Int): Array[Byte] =
    rec(0x027E, le16(row) ++ le16(col) ++ le16(0) ++ le32(rk))
  private def mulRk(row: Int, colFirst: Int, rks: Seq[Int]): Array[Byte] =
    rec(0x00BD, le16(row) ++ le16(colFirst) ++
      rks.flatMap(rk => le16(0) ++ le32(rk)).toArray ++
      le16(colFirst + rks.length - 1))

  /** Workbook stream: globals (BOF, BOUNDSHEET, SST, EOF) + one sheet
    * substream. `sstRecords` lets a test hand-build CONTINUE-split SSTs.
    */
  private def biff(sstRecords: Array[Byte], cellRecords: Array[Byte]): Array[Byte] = {
    val bofGlobals = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ new Array[Byte](12))
    val bofSheet   = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ new Array[Byte](12))
    val eof        = rec(0x000A, Array.empty)
    val sheetName  = "Sheet1"
    val boundsheet = rec(0x0085, le32(0) /* patched below */ ++ le16(0) ++
      Array(sheetName.length.toByte, 0.toByte) ++ sheetName.map(_.toByte).toArray)
    val globals = bofGlobals ++ boundsheet ++ sstRecords ++ eof
    val sheet   = bofSheet ++ cellRecords ++ eof
    val out     = globals ++ sheet
    // patch the BOUNDSHEET lbPlyPos to the sheet substream offset
    val patched = out.clone()
    System.arraycopy(le32(globals.length), 0, patched, bofGlobals.length + 4, 4)
    patched
  }

  private def simpleSst(strings: Seq[String], wide: Boolean = false): Array[Byte] =
    rec(0x00FC, le32(strings.length) ++ le32(strings.length) ++
      strings.flatMap(s => sstString(s, wide)).toArray)

  // ---------- CFB container ----------

  private val EOC  = 0xFFFFFFFE
  private val FREE = 0xFFFFFFFF

  private def dirEntry(name: String, entryType: Int, start: Int, size: Int,
      child: Int = -1): Array[Byte] = {
    val e  = new Array[Byte](128)
    val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    System.arraycopy(nb, 0, e, 0, nb.length)
    System.arraycopy(le16(nb.length + 2), 0, e, 64, 2)
    e(66) = entryType.toByte
    e(67) = 1 // black
    System.arraycopy(le32(-1), 0, e, 68, 4)    // left sibling
    System.arraycopy(le32(-1), 0, e, 72, 4)    // right sibling
    System.arraycopy(le32(child), 0, e, 76, 4) // child
    System.arraycopy(le32(start), 0, e, 116, 4)
    System.arraycopy(le32(size), 0, e, 120, 4)
    e
  }

  private def cfbHeader(numFat: Int, firstDir: Int, firstMiniFat: Int,
      numMiniFat: Int, difat0: Int): Array[Byte] = {
    val h = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, h, 0, 8)
    System.arraycopy(le16(0x003E), 0, h, 24, 2) // minor
    System.arraycopy(le16(0x0003), 0, h, 26, 2) // major 3 (512-byte sectors)
    System.arraycopy(le16(0xFFFE), 0, h, 28, 2) // little-endian
    System.arraycopy(le16(9), 0, h, 30, 2)      // sector shift
    System.arraycopy(le16(6), 0, h, 32, 2)      // mini sector shift
    System.arraycopy(le32(numFat), 0, h, 44, 4)
    System.arraycopy(le32(firstDir), 0, h, 48, 4)
    System.arraycopy(le32(4096), 0, h, 56, 4)   // mini cutoff
    System.arraycopy(le32(firstMiniFat), 0, h, 60, 4)
    System.arraycopy(le32(numMiniFat), 0, h, 64, 4)
    System.arraycopy(le32(EOC), 0, h, 68, 4)    // no DIFAT chain
    System.arraycopy(le32(0), 0, h, 72, 4)
    for (i <- 0 until 109)
      System.arraycopy(le32(if (i == 0) difat0 else FREE), 0, h, 76 + i * 4, 4)
    h
  }

  private def fatSector(entries: Seq[Int]): Array[Byte] = {
    val s = new Array[Byte](512)
    for (i <- 0 until 128)
      System.arraycopy(le32(if (i < entries.length) entries(i) else FREE), 0, s, i * 4, 4)
    s
  }

  private def pad(b: Array[Byte], to: Int): Array[Byte] =
    if (b.length % to == 0 && b.length > 0) b
    else b ++ new Array[Byte]((to - b.length % to) % to)

  /** Regular-FAT layout: the workbook stream is zero-padded past the 4096
    * mini cutoff. Sectors: 0=FAT, 1=directory, 2..=stream.
    */
  private def cfbRegular(stream: Array[Byte]): Array[Byte] = {
    val padded  = pad(stream ++ new Array[Byte](math.max(0, 4096 - stream.length)), 512)
    val n       = padded.length / 512
    val fat     = fatSector(Seq(0xFFFFFFFD, EOC) ++ (3 until 2 + n) :+ EOC)
    val dir = pad(dirEntry("Root Entry", 5, EOC, 0, child = 1) ++
      dirEntry("Workbook", 2, 2, padded.length), 512)
    val out = new ByteArrayOutputStream()
    out.write(cfbHeader(numFat = 1, firstDir = 1, firstMiniFat = EOC, numMiniFat = 0, difat0 = 0))
    out.write(fat); out.write(dir); out.write(padded)
    out.toByteArray
  }

  /** Mini-stream layout (stream < 4096): sectors 0=FAT, 1=directory,
    * 2=miniFAT, 3..=root storage holding 64-byte mini sectors.
    */
  private def cfbMini(stream: Array[Byte]): Array[Byte] = {
    require(stream.length < 4096, "mini layout demands a small stream")
    val container = pad(stream, 64)
    val nMini     = container.length / 64
    val padded    = pad(container, 512)
    val nCont     = padded.length / 512
    val fat       = fatSector(Seq(0xFFFFFFFD, EOC, EOC) ++ (4 until 3 + nCont) :+ EOC)
    val miniFat = {
      val s = new Array[Byte](512)
      for (i <- 0 until 128) {
        val v = if (i < nMini - 1) i + 1 else if (i == nMini - 1) EOC else FREE
        System.arraycopy(le32(v), 0, s, i * 4, 4)
      }
      s
    }
    val dir = pad(dirEntry("Root Entry", 5, 3, container.length, child = 1) ++
      dirEntry("Book", 2, 0, stream.length), 512)
    val out = new ByteArrayOutputStream()
    out.write(cfbHeader(numFat = 1, firstDir = 1, firstMiniFat = 2, numMiniFat = 1, difat0 = 0))
    out.write(fat); out.write(dir); out.write(miniFat); out.write(padded)
    out.toByteArray
  }

  private def writeFile(dir: String, name: String, bytes: Array[Byte]): String = {
    val path = s"$dir/$name"
    val out  = new java.io.FileOutputStream(path)
    out.write(bytes); out.close()
    path
  }

  // ---------- tests ----------

  private def standardCells: Array[Byte] =
    labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++ // header
      labelSst(1, 0, 3) ++ rkCell(1, 1, rkInt(42)) ++ number(1, 2, 1.5) ++
      labelSst(2, 0, 4) ++ mulRk(2, 1, Seq(rkInt(700), rkInt(250, x100 = true))) ++
      labelSst(3, 0, 5) ++ number(3, 1, 7.0) // row 3 col 2 blank -> null

  private def standardSst =
    simpleSst(Seq("id", "n", "x", "a", "b", "c"))

  test("regular-FAT BIFF8 workbook: strings, RK, MULRK, NUMBER, blanks, inference") {
    val dir  = tmpDir()
    val path = writeFile(dir, "wb.xls", cfbRegular(biff(standardSst, standardCells)))
    val df   = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("id", "n", "x"))
    assert(df.schema.map(_.dataType.typeName) == Seq("string", "long", "double"))
    val rows = df.as[(String, Long, Option[Double])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("a", 42L, Some(1.5)), ("b", 700L, Some(2.5)), ("c", 7L, None)))
  }

  test("mini-stream ('Book') layout parses identically") {
    val dir  = tmpDir()
    val path = writeFile(dir, "mini.xls", cfbMini(biff(standardSst, standardCells)))
    val df   = Xls.read(spark, path)
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("id", "n", "x"))
  }

  test("SST strings spanning a CONTINUE boundary re-read the grbit byte") {
    // "id" then one 12-char string split 5/7 across a CONTINUE
    val long  = "abcdefghijkl"
    val sstPayload = le32(2) ++ le32(2) ++ sstString("id") ++
      le16(long.length) ++ Array[Byte](0) ++ long.take(5).map(_.toByte).toArray
    val contPayload = Array[Byte](0) ++ long.drop(5).map(_.toByte).toArray
    val sst = rec(0x00FC, sstPayload) ++ rec(0x003C, contPayload)
    val cells = labelSst(0, 0, 0) ++ labelSst(1, 0, 1)
    val dir  = tmpDir()
    val path = writeFile(dir, "cont.xls", cfbRegular(biff(sst, cells)))
    val df   = Xls.read(spark, path)
    assert(df.as[String].collect().toSeq == Seq(long))
  }

  test("wide (UTF-16) SST strings keep non-ASCII characters") {
    val dir  = tmpDir()
    val sst  = simpleSst(Seq("col", "héllo wörld ±€"), wide = true)
    val path = writeFile(dir, "wide.xls",
      cfbRegular(biff(sst, labelSst(0, 0, 0) ++ labelSst(1, 0, 1))))
    val df = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("col"))
    assert(df.as[String].collect().toSeq == Seq("héllo wörld ±€"))
  }

  test("decodeRk covers all four encodings") {
    assert(Xls.decodeRk(rkInt(1234)) == 1234.0)
    assert(Xls.decodeRk(rkInt(-7)) == -7.0)
    assert(Xls.decodeRk(rkInt(12345, x100 = true)) == 123.45)
    val dBits = java.lang.Double.doubleToLongBits(2.5)
    assert(Xls.decodeRk(((dBits >>> 32) & 0xFFFFFFFCL).toInt) == 2.5)
    assert(Xls.decodeRk((((dBits >>> 32) & 0xFFFFFFFCL) | 1L).toInt) == 0.025)
  }

  test("truncated SST (payload ends, no CONTINUE) errors instead of hanging") {
    // claims a 12-char string but supplies 5 chars and no CONTINUE record
    val sstPayload = le32(1) ++ le32(1) ++
      le16(12) ++ Array[Byte](0) ++ "abcde".map(_.toByte).toArray
    val sst   = rec(0x00FC, sstPayload)
    val cells = labelSst(0, 0, 0)
    val dir   = tmpDir()
    val path  = writeFile(dir, "trunc.xls", cfbRegular(biff(sst, cells)))
    val e = intercept[IllegalArgumentException] { Xls.read(spark, path) }
    assert(e.getMessage.contains("97-2003"))
  }

  test("Xls.write round-trips through Xls.read (types, unicode, nulls)") {
    val dir = tmpDir()
    val df = Seq(
      (1L, Some("héllo ± wörld"), Some(1.5)),
      (2L, None: Option[String], Some(2.0)),
      (3L, Some("plain"), None: Option[Double]),
    ).toDF("id", "name", "score")
    val path = s"$dir/rt.xls"
    Xls.write(spark, df, path)
    val back = Xls.read(spark, path)
    assert(back.columns.toSeq == Seq("id", "name", "score"))
    assert(back.schema.map(_.dataType.typeName) == Seq("long", "string", "double"))
    assert(back.as[(Long, Option[String], Option[Double])].collect().toSet ==
      Set((1L, Some("héllo ± wörld"), Some(1.5)), (2L, None, Some(2.0)), (3L, Some("plain"), None)))
  }

  test("Xls.write spans multiple FAT sectors for larger workbooks") {
    val dir = tmpDir()
    val df = (0 until 3000).map(i => (i.toLong, s"row_value_number_$i")).toDF("id", "v")
    val path = s"$dir/big.xls"
    Xls.write(spark, df, path)
    assert(new java.io.File(path).length() > 64 * 1024) // past one FAT sector's reach
    val back = Xls.read(spark, path)
    assert(back.count() == 3000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).as[Long].head() ==
      (0 until 3000).map(_.toLong).sum)
  }

  test("Xls.write chains DIFAT sectors past the 109-header-slot FAT limit") {
    val dir  = tmpDir()
    val blob = "x" * 200
    val df   = (0 until 40000).map(i => (i.toLong, s"$blob$i")).toDF("id", "v")
    val path = s"$dir/difat.xls"
    Xls.write(spark, df, path)
    // > 7.1 MB stream forces FAT sectors beyond the header DIFAT slots
    assert(new java.io.File(path).length() > 110L * 128 * 512)
    val back = Xls.read(spark, path)
    assert(back.count() == 40000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).as[Long].head() ==
      (0 until 40000).map(_.toLong).sum)
  }

  test("Xls.write enforces the format's row and string limits loudly") {
    val dir = tmpDir()
    val tooManyRows = (0 to 65536).map(i => Tuple1(i.toLong)).toDF("id")
    val e1 = intercept[Exception] { Xls.write(spark, tooManyRows, s"$dir/rows.xls") }
    assert(e1.getMessage.contains("65536 rows"))
    val longString = Seq(Tuple1("y" * 256)).toDF("v")
    val e2 = intercept[Exception] { Xls.write(spark, longString, s"$dir/str.xls") }
    assert(e2.getMessage.contains("255"))
  }

  test("export_to_file with a .xls path writes BIFF; load_file reads it back") {
    val dir = tmpDir()
    val df  = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    graft.ops.ExportToFile.df(spark, df, graft.model.File(s"$dir/out.xls"),
      graft.model.IfExists.Replace, singleFile = true)
    // the file on disk must genuinely be OLE2, not a renamed zip
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/out.xls")).take(4)
    assert(head.map(_ & 0xFF).toSeq == Seq(0xD0, 0xCF, 0x11, 0xE0))
    val back = graft.ops.LoadFile.toDataFrame(spark, graft.model.File(s"$dir/out.xls"))
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("load_file routes a real .xls through the BIFF reader end-to-end") {
    val dir  = tmpDir()
    val path = writeFile(dir, "via_loadfile.xls", cfbRegular(biff(standardSst, standardCells)))
    val df   = graft.ops.LoadFile.toDataFrame(spark, graft.model.File(path))
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("id", "n", "x"))
  }

  // ---------- multi-sheet selection (pandas sheet_name parity) ----------

  /** Workbook stream with several named sheets, BOUNDSHEET offsets patched. */
  private def biffMulti(sheets: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bofGlobals = rec(0x0809, le16(0x0600) ++ le16(0x0005) ++ new Array[Byte](12))
    val bofSheet   = rec(0x0809, le16(0x0600) ++ le16(0x0010) ++ new Array[Byte](12))
    val eof        = rec(0x000A, Array.empty)
    def boundsheet(name: String) = rec(0x0085, le32(0) ++ le16(0) ++
      Array(name.length.toByte, 0.toByte) ++ name.map(_.toByte).toArray)
    val bss          = sheets.map { case (n, _) => boundsheet(n) }
    val globals      = bofGlobals ++ bss.reduce(_ ++ _) ++ simpleSst(Nil) ++ eof
    val sheetStreams = sheets.map { case (_, cells) => bofSheet ++ cells ++ eof }
    val patched      = (globals ++ sheetStreams.reduce(_ ++ _)).clone()
    var bsOff     = bofGlobals.length
    var streamOff = globals.length
    for (i <- sheets.indices) {
      System.arraycopy(le32(streamOff), 0, patched, bsOff + 4, 4)
      bsOff += bss(i).length
      streamOff += sheetStreams(i).length
    }
    patched
  }

  private def label(row: Int, col: Int, s: String): Array[Byte] =
    rec(0x0204, le16(row) ++ le16(col) ++ le16(0) ++ sstString(s))

  test(".xls multi-sheet: default=first BOUNDSHEET; by-name / by-index select others") {
    val dir = tmpDir()
    val wb = biffMulti(Seq(
      "Alpha" -> (label(0, 0, "a") ++ number(1, 0, 1.0)),
      "Beta"  -> (label(0, 0, "b") ++ number(1, 0, 2.0))))
    val path = writeFile(dir, "multi.xls", cfbRegular(wb))
    val first = Xls.read(spark, path)
    assert(first.columns.toSeq == Seq("a"))
    assert(first.as[Long].collect().toSeq == Seq(1L))
    val byName = Xls.read(spark, path, SheetRef.ByName("Beta"))
    assert(byName.columns.toSeq == Seq("b"))
    assert(byName.as[Long].collect().toSeq == Seq(2L))
    val byIdx = Xls.read(spark, path, SheetRef.ByIndex(1))
    assert(byIdx.columns.toSeq == Seq("b"))
    val err = intercept[SheetNotFoundException](Xls.read(spark, path, SheetRef.ByName("Gamma")))
    assert(err.getMessage.contains("Alpha") && err.getMessage.contains("Beta"))
    val err2 = intercept[SheetNotFoundException](Xls.read(spark, path, SheetRef.ByIndex(5)))
    assert(err2.getMessage.contains("2 sheet(s)"))
  }
}
