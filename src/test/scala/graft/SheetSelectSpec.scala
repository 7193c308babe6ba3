package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{SheetNotFoundException, SheetRef, Xlsx}

/** xlsx sheet selection must follow WORKBOOK order (workbook.xml `<sheets>`
  * resolved through workbook.xml.rels), never part filenames: the fixture
  * here names the FIRST sheet's part `data7.xml` and plants a decoy
  * `sheet1.xml` as the SECOND sheet, with scrambled rIds and the decoy
  * stored first in the archive.
  */
class SheetSelectSpec extends SparkSpec {
  import spark.implicits._

  private def sheetXml(header: String, value: Int): String =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
       |<row><c t="inlineStr"><is><t>$header</t></is></c></row>
       |<row><c><v>$value</v></c></row>
       |</sheetData></worksheet>""".stripMargin

  private def writeFixture(path: String): Unit = {
    val out = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    // decoy part FIRST in the archive; it is the SECOND workbook sheet
    put("xl/worksheets/sheet1.xml", sheetXml("b", 2))
    put("xl/worksheets/data7.xml", sheetXml("a", 1))
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Alpha" sheetId="1" r:id="rId9"/><sheet name="Beta" sheetId="2" r:id="rId4"/></sheets>
        |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId4" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/data7.xml"/>
        |</Relationships>""".stripMargin)
    out.close()
  }

  test("xlsx: first sheet resolves via workbook.xml order, not part filename") {
    val path = s"${tmpDir()}/scrambled.xlsx"
    writeFixture(path)
    val first = Xlsx.read(spark, path)
    assert(first.columns.toSeq == Seq("a"), "default must be the workbook-order first sheet")
    assert(first.as[Long].collect().toSeq == Seq(1L))
  }

  test("xlsx: sheet by name and by index; unknown sheet lists what exists") {
    val path = s"${tmpDir()}/scrambled2.xlsx"
    writeFixture(path)
    val beta = Xlsx.read(spark, path, SheetRef.ByName("Beta"))
    assert(beta.columns.toSeq == Seq("b"))
    assert(beta.as[Long].collect().toSeq == Seq(2L))
    assert(Xlsx.read(spark, path, SheetRef.ByIndex(1)).columns.toSeq == Seq("b"))
    val err = intercept[SheetNotFoundException](Xlsx.read(spark, path, SheetRef.ByName("Gamma")))
    assert(err.getMessage.contains("Alpha") && err.getMessage.contains("Beta"))
  }

  test("xlsx written by Xlsx.write still round-trips through the resolver") {
    val path = s"${tmpDir()}/own.xlsx"
    val df   = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    Xlsx.write(spark, df, path)
    val back = Xlsx.read(spark, path, SheetRef.ByName("Sheet1"))
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "x"), (2L, "y")))
  }

  test("load_file threads the sheet option through") {
    import graft.model.{File => GFile}
    import graft.ops.{LoadFile, LoadOptions}
    val path = s"${tmpDir()}/opt.xlsx"
    writeFixture(path)
    val df = LoadFile.toDataFrame(spark, GFile(path),
      LoadOptions(sheet = SheetRef.ByName("Beta")))
    assert(df.columns.toSeq == Seq("b"))
  }
}
