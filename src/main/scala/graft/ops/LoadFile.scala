package graft.ops

import graft.model._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Options for [[LoadFile]] (reference: LoadFileOperator params,
  * python-sdk/src/astro/sql/operators/load_file.py:58-118).
  *
  * - `ifExists`: replace|append → SaveMode (load_file.py:140-169)
  * - `inferRows`: schema-autodetect row cap, mirrors
  *   LOAD_TABLE_AUTODETECT_ROWS_COUNT=1000 (settings.py:67-69) — at 100 TB an
  *   unbounded CSV inference pass is a full extra scan, so the cap matters.
  * - `normalize`/`normalizeSep`: opt-in nested-struct flatten à la
  *   pandas.json_normalize (files/types/ndjson.py:54-96): `a.b` → `a_b`.
  * - `capitalization`: upper|lower|original column renaming
  *   (utils/dataframe.py:17-33).
  * - `schema`: explicit columns, mirrors `Table(columns=[...])`
  *   (databases/base.py:257-268).
  */
final case class LoadOptions(
    ifExists: IfExists = IfExists.Replace,
    inferRows: Int = 1000,
    normalize: Boolean = false,
    normalizeSep: String = "_",
    capitalization: Capitalization = Capitalization.Original,
    readerOptions: Map[String, String] = Map.empty,
    schema: Option[StructType] = None,
    partitionBy: Seq[String] = Nil,
    sheet: graft.sources.SheetRef = graft.sources.SheetRef.First,
)

/** `load_file`: file(s)/pattern at any Hadoop-FS location → DataFrame or
  * catalog table (reference: python-sdk/src/astro/sql/operators/load_file.py:37-203).
  *
  * Spark-first: the reference's native-vs-pandas path duality
  * (databases/base.py:474-542) collapses into one distributed
  * `spark.read` — executors pull from the object store in parallel; no
  * driver funnel, no chunking knobs.
  */
object LoadFile {

  /** Load into a DataFrame (reference: load_file.py:171-203, used when no
    * output_table is given).
    */
  def toDataFrame(spark: SparkSession, file: File, opts: LoadOptions = LoadOptions()): DataFrame = {
    // Unsupported locations fail fast with a typed, actionable error
    // (gdrive://, or any scheme with no registered FileSystem).
    graft.sources.Locations.requireSupported(file.path)
    // HTTP(S)/FTP/SFTP locations (reference files/locations/{http,ftp,sftp}
    // .py): driver-side staged fetch, then the normal distributed read over
    // the local copy.
    val resolved =
      if (graft.sources.Remote.isRemoteUrl(file.path))
        file.copy(path = graft.sources.Remote.fetchToScratch(spark, file.path))
      else if (graft.sources.Ftp.isFtpUrl(file.path))
        file.copy(path = graft.sources.Ftp.fetchToScratch(spark, file.path))
      else if (graft.sources.Sftp.isSftpUrl(file.path))
        file.copy(path = graft.sources.Sftp.fetchToScratch(spark, file.path))
      else file
    val path = resolvePath(spark, resolved)
    val ft = resolved.resolvedType.getOrElse(
      // Pattern/prefix: sniff the type from the first resolved file
      // (reference uses the first file for schema autodetect too,
      // databases/base.py:430-444).
      firstFileType(spark, path).getOrElse(
        throw new IllegalArgumentException(s"cannot determine filetype for ${file.path}"))
    )
    val raw = read(spark, path, ft, opts)
    val flat = if (opts.normalize) flatten(raw, opts.normalizeSep) else raw
    capitalize(flat, opts.capitalization)
  }

  /** Load into a catalog table (reference: load_file.py:140-169). Returns the
    * table pointer. `ifExists` maps onto SaveMode (replace → Overwrite,
    * append → Append).
    */
  def toTable(
      spark: SparkSession,
      file: File,
      table: Table,
      opts: LoadOptions = LoadOptions(),
  ): Table = {
    val df = toDataFrame(spark, file, opts)
    opts.ifExists match {
      case IfExists.Replace =>
        // Idempotent across sessions (stale warehouse dirs are cleared).
        TableIO.overwrite(spark, df, table, opts.partitionBy)
      case IfExists.Append =>
        df.write.mode(SaveMode.Append).saveAsTable(table.qualifiedName)
      case IfExists.Exception =>
        val w = df.write.mode(SaveMode.ErrorIfExists)
        (if (opts.partitionBy.nonEmpty) w.partitionBy(opts.partitionBy: _*) else w)
          .saveAsTable(table.qualifiedName)
    }
    table
  }

  private def read(spark: SparkSession, path: String, ft: FileType, opts: LoadOptions): DataFrame = {
    val base = spark.read.options(opts.readerOptions)
    ft match {
      case FileType.Csv =>
        val withHeader = base.option("header", opts.readerOptions.getOrElse("header", "true"))
        opts.schema match {
          case Some(s) => withHeader.schema(s).csv(path)
          case None    =>
            // Two-pass inference with a row cap (mirrors the reference's
            // 1000-row autodetect; avoids a full inference scan at scale):
            // infer on a bounded sample, then read the full data with the
            // inferred schema.
            import spark.implicits._
            val sampleLines = spark.read.textFile(path).limit(math.max(opts.inferRows, 1) + 1)
            val inferred = spark.read.options(opts.readerOptions)
              .option("header", opts.readerOptions.getOrElse("header", "true"))
              .option("inferSchema", "true")
              .csv(sampleLines)
              .schema
            withHeader.schema(inferred).csv(path)
        }
      case FileType.Ndjson =>
        opts.schema match {
          case Some(s) => base.schema(s).json(path)
          case None    =>
            import spark.implicits._
            val sampleLines = spark.read.textFile(path).limit(math.max(opts.inferRows, 1))
            val inferred    = spark.read.options(opts.readerOptions).json(sampleLines).schema
            base.schema(inferred).json(path)
        }
      case FileType.Json =>
        // JSON array files need multiLine (reference json.py reads the whole
        // array via pandas; files/types/json.py:14-55).
        val rdr = base.option("multiLine", "true")
        opts.schema.fold(rdr.json(path))(s => rdr.schema(s).json(path))
      case FileType.Parquet =>
        opts.schema.fold(base.parquet(path))(s => base.schema(s).parquet(path))
      case FileType.Orc =>
        opts.schema.fold(base.orc(path))(s => base.schema(s).orc(path))
      case FileType.Xlsx =>
        // Driver-side SpreadsheetML parse (no Spark xlsx source exists);
        // small-file format by nature — see graft.sources.Xlsx.
        val df = graft.sources.Xlsx.read(spark, path, opts.sheet)
        opts.schema.fold(df)(s =>
          df.select(s.fields.toSeq.map(f => col(f.name).cast(f.dataType)): _*))
    }
  }

  /** Pattern/prefix resolution (reference resolve_file_path_pattern,
    * files/base.py:253-286): Spark reads directories and globs natively; a
    * bare prefix (extension-less, not a directory) becomes `prefix*`.
    */
  private[graft] def resolvePath(spark: SparkSession, file: File): String = {
    if (!file.isPattern) return file.path
    if (file.path.exists("*?[{".contains(_))) return file.path
    val p  = new Path(file.path)
    val fs = graft.sources.Locations.fileSystemFor(spark.sparkContext.hadoopConfiguration, p)
    if (fs.exists(p) && fs.getFileStatus(p).isDirectory) file.path
    else file.path + "*"
  }

  private def firstFileType(spark: SparkSession, path: String): Option[FileType] = {
    val p   = new Path(path)
    val fs  = graft.sources.Locations.fileSystemFor(spark.sparkContext.hadoopConfiguration, p)
    val hit = Option(fs.globStatus(p)).getOrElse(Array.empty).flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filterNot(_.isDirectory) else Array(st)
    }.map(_.getPath.getName).flatMap(FileType.fromPath)
    hit.headOption
  }

  /** Recursive struct flatten: `{"a": {"b": 1}}` → column `a_b`
    * (reference pandas.json_normalize with sep, files/types/ndjson.py:54-96).
    * Arrays are kept as-is (json_normalize does not explode arrays either).
    * Implemented as a single projection — Catalyst prunes unused branches.
    */
  private[graft] def flatten(df: DataFrame, sep: String): DataFrame = {
    def cols(schema: StructType, prefix: Seq[String]): Seq[org.apache.spark.sql.Column] =
      schema.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case st: StructType => cols(st, path)
          case _ =>
            Seq(col(path.map(n => s"`${n.replace("`", "``")}`").mkString(".")).as(path.mkString(sep)))
        }
      }
    val projected = cols(df.schema, Nil)
    if (projected.exists(_ != null)) df.select(projected: _*) else df
  }

  private[graft] def capitalize(df: DataFrame, cap: Capitalization): DataFrame = cap match {
    case Capitalization.Original => df
    case Capitalization.Upper    => df.toDF(df.columns.map(_.toUpperCase): _*)
    case Capitalization.Lower    => df.toDF(df.columns.map(_.toLowerCase): _*)
  }
}

/** `get_file_list`: list files matching a path/prefix (reference:
  * python-sdk/src/astro/files/operators/files.py:13-43). Driver-side catalog
  * metadata op — listing is cheap; the data never moves.
  */
object GetFileList {
  def apply(spark: SparkSession, pathPattern: String): Seq[String] = {
    if (graft.sources.Ftp.isFtpUrl(pathPattern))
      return graft.sources.Ftp.list(pathPattern)
    if (graft.sources.Sftp.isSftpUrl(pathPattern))
      return graft.sources.Sftp.list(pathPattern)
    val p  = new Path(pathPattern)
    val fs = graft.sources.Locations.fileSystemFor(spark.sparkContext.hadoopConfiguration, p)
    val glob =
      if (pathPattern.exists("*?[{".contains(_))) p
      else if (fs.exists(p) && fs.getFileStatus(p).isDirectory) new Path(pathPattern.stripSuffix("/") + "/*")
      else new Path(pathPattern + "*")
    Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .filterNot(_.isDirectory)
      .map(_.getPath.toString)
      .toSeq
      .sorted
  }
}
