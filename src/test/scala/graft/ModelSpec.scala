package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("auto temp table: _tmp prefix, <=62 chars, temp flag") {
    val t = Table.temp()
    assert(t.name.startsWith("_tmp_"))
    assert(t.name.length <= Table.MaxTableNameLength)
    assert(t.temp)
  }

  test("explicitly _tmp-named table is flagged temp (reference table.py:89-94)") {
    assert(Table("_tmp_custom").temp)
    assert(!Table("regular").temp)
  }

  test("qualifiedName escapes embedded backticks") {
    val t = Table("we`ird", Metadata(database = Some("d`b")), temp = false)
    assert(t.qualifiedName == "`d``b`.`we``ird`")
  }

  test("Table json round-trip") {
    val t = Table("t1", Metadata(schema = Some("s"), database = Some("db")), temp = true)
    assert(Table.fromJson(t.toJson) == t)
  }

  test("File json round-trip + special chars") {
    val f = File("""/data/a "b"\n.csv""", Some(FileType.Csv))
    assert(File.fromJson(f.toJson) == f)
  }

  test("FileType extension dispatch") {
    assert(FileType.fromPath("/a/b/data.csv").contains(FileType.Csv))
    assert(FileType.fromPath("x.ndjson").contains(FileType.Ndjson))
    assert(FileType.fromPath("x.jsonl").contains(FileType.Ndjson))
    assert(FileType.fromPath("x.parquet").contains(FileType.Parquet))
    assert(FileType.fromPath("/a/prefix").isEmpty)
  }

  test("pattern detection: extension-less path is a pattern") {
    assert(File("/data/prefix").isPattern)
    assert(!File("/data/file.csv").isPattern)
    assert(!File("/data/prefix", Some(FileType.Csv)).isPattern)
  }

  test("IfExists per-operation validation (reference constants.py:86-88)") {
    assert(IfExists.forLoad("replace") == IfExists.Replace)
    assert(IfExists.forLoad("append") == IfExists.Append)
    intercept[IllegalArgumentException](IfExists.forLoad("exception"))
    assert(IfExists.forExport("exception") == IfExists.Exception)
    intercept[IllegalArgumentException](IfExists.forExport("append"))
  }

  test("MergeConflict / Capitalization parsing") {
    assert(MergeConflict.fromString("update") == MergeConflict.Update)
    intercept[IllegalArgumentException](MergeConflict.fromString("nope"))
    assert(Capitalization.fromString("upper") == Capitalization.Upper)
  }
}
