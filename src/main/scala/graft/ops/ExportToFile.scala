package graft.ops

import graft.model._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** `export_to_file`: table/DataFrame → file at any Hadoop-FS location
  * (reference: python-sdk/src/astro/sql/operators/export_to_file.py:18-183;
  * writers files/types/{csv,json,ndjson,parquet}.py).
  *
  * Two modes:
  *  - `singleFile = false` (the scale path): a plain distributed
  *    `df.write` to a directory — this is what 100 TB exports must use.
  *  - `singleFile = true` (reference parity: the SDK always writes ONE file
  *    at the exact path): coalesce(1) into a temp dir, then rename the part
  *    file. Documented cap: the whole output flows through one task — fine
  *    for result extracts, wrong for bulk data (use the directory mode).
  */
object ExportToFile {

  def table(
      spark: SparkSession,
      input: Table,
      output: File,
      ifExists: IfExists = IfExists.Exception,
      singleFile: Boolean = true,
      compression: Option[String] = None,
  ): File =
    df(spark, spark.table(input.qualifiedName), output, ifExists, singleFile, compression)

  /** `compression`: a Spark codec name ("gzip", "bzip2", "zstd", …) applied
    * to the written files; load-side detection is by extension, so
    * `File("x.csv.gz")` round-trips (see FileType.fromPath). Not supported
    * for the wrapped-JSON-array or spreadsheet formats (driver-side
    * rewrites of the content, not codec streams).
    */
  def df(
      spark: SparkSession,
      input: DataFrame,
      output: File,
      ifExists: IfExists = IfExists.Exception,
      singleFile: Boolean = true,
      compression: Option[String] = None,
  ): File = {
    val ft = output.resolvedType.getOrElse(
      throw new IllegalArgumentException(s"cannot determine filetype for ${output.path}"))
    val conf = spark.sparkContext.hadoopConfiguration
    val outPath = new Path(output.path)
    val fs = graft.sources.Locations.fileSystemFor(conf, outPath)

    ifExists match {
      case IfExists.Exception if fs.exists(outPath) =>
        throw new IllegalStateException(s"${output.path} already exists and if_exists=exception")
      case IfExists.Append =>
        throw new IllegalArgumentException("export if_exists must be replace|exception")
      case _ => ()
    }

    if (compression.isDefined && (ft == FileType.Json || ft == FileType.Xlsx))
      throw new IllegalArgumentException(
        s"compression is not supported for ${ft.name} exports")

    if (ft == FileType.Xlsx) {
      // spreadsheets are driver-side single-file formats (graft.sources);
      // there is no distributed variant to choose. The extension picks the
      // container: .xls -> BIFF8/OLE2, anything else -> SpreadsheetML zip.
      if (output.path.toLowerCase.endsWith(".xls"))
        graft.sources.Xls.write(spark, input, output.path)
      else graft.sources.Xlsx.write(spark, input, output.path)
      return output
    }

    if (!singleFile) {
      val mode = if (ifExists == IfExists.Replace) SaveMode.Overwrite else SaveMode.ErrorIfExists
      write(input, output.path, ft, mode, compression)
      return output
    }

    // Single-file parity: write via a temp dir then move the one part file.
    val tmpDir = new Path(outPath.getParent, s".graft_export_${java.util.UUID.randomUUID().toString.take(12)}")
    write(input.coalesce(1), tmpDir.toString, ft, SaveMode.Overwrite, compression)
    try {
      val part = fs.listStatus(tmpDir).map(_.getPath)
        .find(p => p.getName.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file produced under $tmpDir"))
      if (fs.exists(outPath)) fs.delete(outPath, false)
      if (ft == FileType.Json) jsonArrayRewrite(fs, part, outPath)
      else if (!fs.rename(part, outPath))
        throw new IllegalStateException(s"rename $part -> $outPath failed")
    } finally fs.delete(tmpDir, true)
    output
  }

  private def write(
      df: DataFrame, path: String, ft: FileType, mode: SaveMode,
      compression: Option[String] = None): Unit = {
    val w0 = df.write.mode(mode)
    val w  = compression.fold(w0)(c => w0.option("compression", c))
    ft match {
      case FileType.Csv     => w.option("header", "true").csv(path)
      case FileType.Ndjson  => w.json(path) // Spark's json writer IS ndjson
      case FileType.Json    => w.json(path) // wrapped into an array post-hoc (single-file mode)
      case FileType.Parquet => w.parquet(path)
      case FileType.Orc     => w.orc(path)
      case FileType.Xlsx =>
        throw new IllegalStateException("xlsx handled before the distributed writer") // see df()
    }
  }

  /** JSON-array parity (reference files/types/json.py:45-51 writes
    * `orient="records"` — one array): stream the ndjson part file into
    * `[...]` form. Driver-side streaming copy, bounded by the single-file
    * mode's contract.
    */
  private def jsonArrayRewrite(fs: FileSystem, src: Path, dst: Path): Unit = {
    val in  = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(src), "UTF-8"))
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(fs.create(dst, true), "UTF-8"))
    try {
      out.write("[")
      var first = true
      var line  = in.readLine()
      while (line != null) {
        if (line.nonEmpty) {
          if (!first) out.write(",")
          out.write(line)
          first = false
        }
        line = in.readLine()
      }
      out.write("]")
    } finally { in.close(); out.close() }
  }
}

/** `dataframe` op: bridge catalog tables ↔ a user transform function
  * (reference: python-sdk/src/astro/sql/operators/dataframe.py:99-343).
  * The reference round-trips the whole table through worker pandas memory —
  * its scalability cliff (SURVEY.md §3.3). Here the user function is
  * `DataFrame => DataFrame`, composed lazily into the distributed plan: no
  * memory cliff, Catalyst optimizes across the boundary.
  */
object DataframeOp {

  def run(
      spark: SparkSession,
      inputs: Seq[Table],
      fn: Seq[DataFrame] => DataFrame,
      capitalization: Capitalization = Capitalization.Original,
  ): DataFrame = {
    val dfs = inputs.map(t => spark.table(t.qualifiedName))
    LoadFile.capitalize(fn(dfs), capitalization)
  }

  def toTable(
      spark: SparkSession,
      inputs: Seq[Table],
      fn: Seq[DataFrame] => DataFrame,
      output: Table,
      ifExists: IfExists = IfExists.Replace,
      capitalization: Capitalization = Capitalization.Original,
  ): Table = {
    val result = run(spark, inputs, fn, capitalization)
    if (ifExists == IfExists.Append)
      result.write.mode(SaveMode.Append).saveAsTable(output.qualifiedName)
    else TableIO.overwrite(spark, result, output)
    output
  }
}
