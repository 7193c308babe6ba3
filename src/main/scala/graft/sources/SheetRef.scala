package graft.sources

/** Worksheet selector for spreadsheet reads — the pandas `sheet_name`
  * surface (reference reads spreadsheets via pandas with `sheet_name=0`
  * defaulting to the first sheet in WORKBOOK order:
  * python-sdk/src/astro/files/types/xls.py, xlsx.py). Position is 0-based
  * workbook order — the order sheets appear in the workbook catalog
  * (`workbook.xml` for xlsx, BOUNDSHEET records for xls), never the
  * archive's part filenames, which are not guaranteed to align.
  */
sealed trait SheetRef

/** Selection failures must surface as "no such sheet", not get re-wrapped
  * by codec-level corrupt-file handlers.
  */
final class SheetNotFoundException(msg: String) extends IllegalArgumentException(msg)

object SheetRef {
  final case class ByIndex(index: Int) extends SheetRef
  final case class ByName(name: String) extends SheetRef

  /** pandas `sheet_name=0` default. */
  val First: SheetRef = ByIndex(0)

  /** Resolve `ref` against `(sheetName, payload)` pairs in workbook order. */
  def select[A](sheets: Seq[(String, A)], ref: SheetRef, path: String): A = ref match {
    case ByIndex(i) =>
      if (i < 0 || i >= sheets.size)
        throw new SheetNotFoundException(
          s"$path: sheet index $i out of range — workbook has ${sheets.size} sheet(s): " +
            sheets.map(_._1).mkString("[", ", ", "]"))
      sheets(i)._2
    case ByName(n) =>
      sheets.find(_._1 == n).map(_._2).getOrElse(
        throw new SheetNotFoundException(
          s"$path: no sheet named '$n' — workbook has: " +
            sheets.map(_._1).mkString("[", ", ", "]")))
  }
}
