package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal xlsx read/write with no external dependencies — xlsx is zipped
  * ECMA-376 SpreadsheetML, parseable with `java.util.zip` + StAX. Closes
  * the reference's xlsx surface (python-sdk/src/astro/files/types/xlsx.py
  * reads via pandas/openpyxl; export_to_file writes it likewise).
  *
  * Driver-side by design: a spreadsheet is a small-file format (the
  * reference funnels it through a single pandas DataFrame too). The parsed
  * rows become a normal distributed DataFrame; at scale the data belongs in
  * parquet/csv the moment it enters the pipeline.
  *
  * Supported: sheet selection by workbook-order index or name (pandas
  * `sheet_name` parity; default = first sheet in `workbook.xml` order, with
  * part names resolved through workbook.xml.rels — part FILENAMES are not
  * ordering), header row, shared + inline strings, numeric cells; column
  * types inferred as long/double/string (blank → null).
  */
object Xlsx {

  // ---------- read ----------

  /** OLE2 compound-document magic — the container of legacy 97-2003 `.xls`
    * (BIFF) workbooks, which route to the [[Xls]] BIFF8 reader. Dispatch is
    * by content, not extension, so a mislabeled workbook still parses with
    * the right codec. (Reference reads both via pandas:
    * python-sdk/src/astro/files/types/xls.py.)
    */
  private val Ole2Magic =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  def read(spark: SparkSession, path: String, sheet: SheetRef = SheetRef.First): DataFrame = {
    val p   = new Path(path)
    val fs  = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw = new BufferedInputStream(fs.open(p))
    raw.mark(Ole2Magic.length)
    val head = raw.readNBytes(Ole2Magic.length)
    raw.reset()
    if (java.util.Arrays.equals(head, Ole2Magic)) {
      raw.close()
      return Xls.read(spark, path, sheet)
    }
    val in = new ZipInputStream(raw)
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheetRows: Seq[Seq[Option[String]]] = Seq.empty
    var sheetIsString: Seq[Seq[Boolean]] = Seq.empty
    try {
      // one pass over the archive, collecting every part sheet resolution
      // can need — zip entry order is arbitrary, so selection happens after
      var workbookXml: Option[Array[Byte]] = None
      var relsXml: Option[Array[Byte]]     = None
      val worksheetParts = mutable.HashMap[String, Array[Byte]]()
      var entry: ZipEntry = in.getNextEntry
      while (entry != null) {
        entry.getName match {
          case "xl/sharedStrings.xml"    => shared = parseSharedStrings(in.readAllBytes())
          case "xl/workbook.xml"         => workbookXml = Some(in.readAllBytes())
          case "xl/_rels/workbook.xml.rels" => relsXml = Some(in.readAllBytes())
          case n if n.startsWith("xl/worksheets/") && n.endsWith(".xml") =>
            worksheetParts(n) = in.readAllBytes()
          case _ => ()
        }
        entry = in.getNextEntry
      }
      if (worksheetParts.isEmpty)
        throw new IllegalArgumentException(s"no worksheet in $path")
      // workbook.xml's <sheets> order is the authoritative sheet order; the
      // r:id → part mapping lives in workbook.xml.rels. Part FILENAMES are
      // not ordering (a workbook's first sheet need not be sheet1.xml).
      val ordered: Seq[(String, String)] = (workbookXml, relsXml) match {
        case (Some(wb), Some(rels)) =>
          val targets = parseRels(rels)
          parseWorkbookSheets(wb).flatMap { case (name, rid) =>
            targets.get(rid).map { t =>
              val part = if (t.startsWith("/")) t.drop(1) else "xl/" + t
              name -> part
            }
          }
        case _ =>
          // degenerate archive (no workbook catalog): filename order is the
          // only signal left
          worksheetParts.keys.toSeq.sorted.map(n => n -> n)
      }
      val known = ordered.filter { case (_, part) => worksheetParts.contains(part) }
      if (known.isEmpty)
        throw new IllegalArgumentException(
          s"$path: workbook.xml references no worksheet part present in the archive")
      val partName = SheetRef.select(known, sheet, path)
      val (rows, isStr) = parseSheet(worksheetParts(partName))
      sheetRows = rows; sheetIsString = isStr
    } finally in.close()

    // resolve shared-string references now that both parts are read
    val resolved = sheetRows.zip(sheetIsString).map { case (row, strFlags) =>
      row.zip(strFlags).map {
        case (Some(v), true) if v.startsWith("\u0000s") => Some(shared(v.drop(2).toInt))
        case (v, _) => v
      }
    }
    SheetGrid.toDataFrame(spark, resolved.map(_.toSeq), path)
  }

  /** `<sheet name=... r:id=.../>` entries of workbook.xml, in order. */
  private def parseWorkbookSheets(bytes: Array[Byte]): Seq[(String, String)] = {
    val out = mutable.ArrayBuffer[(String, String)]()
    val r   = xmlReader(bytes)
    val relNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT if r.getLocalName == "sheet" =>
          val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
          val rid  = Option(r.getAttributeValue(relNs, "id"))
            .orElse(Option(r.getAttributeValue(null, "id")))
          rid.foreach(id => out += (name -> id))
        case _ => ()
      }
    }
    out.toSeq
  }

  /** Relationship Id → Target map of workbook.xml.rels. */
  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val out = mutable.HashMap[String, String]()
    val r   = xmlReader(bytes)
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT if r.getLocalName == "Relationship" =>
          for {
            id <- Option(r.getAttributeValue(null, "Id"))
            t  <- Option(r.getAttributeValue(null, "Target"))
          } out(id) = t
        case _ => ()
      }
    }
    out.toMap
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val r   = xmlReader(bytes)
    var inSi = false
    val sb   = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          inSi = true; sb.clear()
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inSi =>
          sb ++= r.getText
        case _ => ()
      }
    }
    out.toIndexedSeq
  }

  /** Returns (rows of cell values, matching is-string-reference flags).
    * Shared-string cells are encoded as `\u0000s<index>` and resolved by the
    * caller (the zip's entry order is not guaranteed).
    */
  private def parseSheet(bytes: Array[Byte]): (Seq[Seq[Option[String]]], Seq[Seq[Boolean]]) = {
    val rows    = mutable.ArrayBuffer[Seq[Option[String]]]()
    val strRows = mutable.ArrayBuffer[Seq[Boolean]]()
    val r       = xmlReader(bytes)
    var row: mutable.ArrayBuffer[Option[String]] = null
    var strRow: mutable.ArrayBuffer[Boolean]     = null
    var cellCol  = -1
    var cellType = ""
    var inV      = false
    var inIs     = false
    val text     = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer(); strRow = mutable.ArrayBuffer()
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            case "v" => inV = true; text.clear()
            case "is" => inIs = true; text.clear()
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inIs =>
          text ++= r.getText
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "is" =>
              while (row.length <= cellCol) { row += None; strRow += false }
              if (cellType == "s") { row(cellCol) = Some("\u0000s" + text.toString); strRow(cellCol) = true }
              else { row(cellCol) = Some(text.toString); strRow(cellCol) = false }
              inV = false; inIs = false
            case "row" => rows += row.toSeq; strRows += strRow.toSeq
            case _ => ()
          }
        case _ => ()
      }
    }
    (rows.toSeq, strRows.toSeq)
  }

  /** "C7" → 2 (0-based column index). */
  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1

  private def xmlReader(bytes: Array[Byte]) = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  // ---------- write ----------

  /** Write `df` as a single-sheet xlsx (header + inline-string/numeric
    * cells). Driver-side single file — the same contract as single-file csv
    * export; bounded use only.
    */
  def write(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val p   = new Path(path)
    val fs  = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new ZipOutputStream(new BufferedOutputStream(fs.create(p, true)))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    try {
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin)
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n"
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      def cellXml(v: Any): String = v match {
        case null => ""
        case n: Byte => s"<c><v>$n</v></c>"
        case n: Short => s"<c><v>$n</v></c>"
        case n: Int => s"<c><v>$n</v></c>"
        case n: Long => s"<c><v>$n</v></c>"
        case n: Float => s"<c><v>$n</v></c>"
        case n: Double => s"<c><v>$n</v></c>"
        case n: java.math.BigDecimal => s"<c><v>$n</v></c>"
        case other => s"""<c t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
      }
      sb ++= "<row>" + df.columns.map(c => cellXml(c)).mkString + "</row>"
      // driver-side single-file contract: bounded result sets only
      df.toLocalIterator().forEachRemaining { row =>
        sb ++= "<row>" + row.toSeq.map(cellXml).mkString + "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally out.close()
  }
}
