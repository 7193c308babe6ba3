package graft.model

import java.util.UUID

/** Core data model for the graft engine.
  *
  * Mirrors the reference's fundamental abstractions (see SURVEY.md §1;
  * reference: python-sdk/src/astro/table.py:37-250 and
  * python-sdk/src/astro/files/base.py:19-250) re-expressed as small Scala
  * case classes. A [[Table]] is a *pointer* into the Spark catalog — it holds
  * no data. A [[File]] is a path plus enough metadata to dispatch a
  * DataFrameReader/Writer.
  */
final case class Metadata(schema: Option[String] = None, database: Option[String] = None) {
  def isEmpty: Boolean = schema.isEmpty && database.isEmpty
}

object Table {
  /** reference: python-sdk/src/astro/table.py:14-15 */
  val MaxTableNameLength = 62
  val TempPrefix         = "_tmp"

  /** Auto-named temp table, `_tmp_`-prefixed, capped at 62 chars
    * (reference: python-sdk/src/astro/table.py:68-94).
    */
  def temp(metadata: Metadata = Metadata()): Table = {
    val unique = UUID.randomUUID().toString.replace("-", "")
    val name   = (TempPrefix + "_" + unique).take(MaxTableNameLength)
    Table(name, metadata, temp = true)
  }

  /** Like the reference's `__attrs_post_init__` (table.py:89-94), a name that
    * already carries the temp prefix is treated as a temp table.
    */
  def apply(name: String): Table =
    Table(name, Metadata(), temp = name.startsWith(TempPrefix))

  /** Minimal JSON round-trip for pipeline hand-off persistence
    * (reference XCom serializer: python-sdk/src/astro/custom_backend/serializer.py:29-127).
    */
  def fromJson(json: String): Table = {
    val m = Json.parseFlat(json)
    Table(
      m.getOrElse("name", ""),
      Metadata(m.get("schema").filter(_.nonEmpty), m.get("database").filter(_.nonEmpty)),
      temp = m.get("temp").contains("true"),
    )
  }
}

final case class Table(name: String, metadata: Metadata, temp: Boolean) {
  /** Fully-qualified name inside the Spark catalog (database.table).
    * Embedded backticks are escaped by doubling (Spark identifier quoting).
    */
  def qualifiedName: String = {
    def bq(s: String) = "`" + s.replace("`", "``") + "`"
    metadata.database.orElse(metadata.schema) match {
      case Some(db) => s"${bq(db)}.${bq(name)}"
      case None     => bq(name)
    }
  }
  def uri: String = s"graft://tables/${metadata.database.getOrElse("default")}/$name"
  def toJson: String = Json.obj(
    "name"     -> name,
    "schema"   -> metadata.schema.getOrElse(""),
    "database" -> metadata.database.getOrElse(""),
    "temp"     -> temp.toString,
  )
}

/** File formats the engine loads/exports (reference: constants.py:36-47).
  * xlsx reads/writes through the dependency-free SpreadsheetML codec in
  * [[graft.sources.Xlsx]] (driver-side staging — spreadsheets are an
  * inherently small-file on-ramp, not a bulk path).
  */
sealed abstract class FileType(val name: String, val extensions: Seq[String])
object FileType {
  case object Csv     extends FileType("csv", Seq("csv"))
  case object Json    extends FileType("json", Seq("json"))
  case object Ndjson  extends FileType("ndjson", Seq("ndjson", "jsonl"))
  case object Parquet extends FileType("parquet", Seq("parquet", "pq"))
  case object Xlsx    extends FileType("xlsx", Seq("xlsx", "xls"))
  // Beyond the reference's five types: ORC is the other columnar format
  // Spark ships natively; a Spark-first engine gets it for free.
  case object Orc     extends FileType("orc", Seq("orc"))

  val all: Seq[FileType] = Seq(Csv, Json, Ndjson, Parquet, Xlsx, Orc)

  /** Codec suffixes that Spark's text-based readers decompress transparently
    * (Hadoop compression codecs keyed by extension): `x.csv.gz` is a CSV.
    */
  private val compressionExts =
    Set("gz", "gzip", "bz2", "deflate", "zst", "zstd", "lz4", "snappy")

  /** Extension-dispatched type detection, looking through compression
    * suffixes (reference: python-sdk/src/astro/files/types/__init__.py:52-78).
    */
  def fromPath(path: String): Option[FileType] = {
    val base = path.stripSuffix("/").split('/').lastOption.getOrElse("")
    val ext = base.split('.').drop(1).map(_.toLowerCase)
      .reverse.dropWhile(compressionExts.contains).headOption
    ext.flatMap(e => all.find(_.extensions.contains(e)))
  }

  def fromString(s: String): FileType =
    all.find(_.name == s.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown filetype: $s"))
}

object File {
  def apply(path: String): File = File(path, None)
  def fromJson(json: String): File = {
    val m = Json.parseFlat(json)
    File(m.getOrElse("path", ""), m.get("filetype").filter(_.nonEmpty).map(FileType.fromString))
  }
}

/** A file (or glob/prefix pattern) at some location. Location dispatch is
  * delegated to Hadoop FS schemes (s3a://, gs://, file://, …) — Spark
  * executors read object stores directly, so the reference's per-location
  * smart_open machinery collapses into the path string.
  * (reference: python-sdk/src/astro/files/base.py:19-250)
  */
final case class File(path: String, filetype: Option[FileType]) {
  /** A path with no recognized extension is a pattern/prefix
    * (reference: python-sdk/src/astro/files/base.py:109-115).
    */
  def isPattern: Boolean =
    filetype.isEmpty && FileType.fromPath(path).isEmpty
  def resolvedType: Option[FileType] = filetype.orElse(FileType.fromPath(path))
  /** Scheme-less paths are left untouched — Hadoop FS resolves them against
    * the default filesystem (a naive "file://" + relative path would parse
    * the first segment as the URI authority).
    */
  def uri: String = path
  def toJson: String =
    Json.obj("path" -> path, "filetype" -> filetype.map(_.name).getOrElse(""))
}

/** Load-time exists strategy (reference LoadExistStrategy, constants.py:86:
  * replace|append).
  */
sealed trait IfExists
object IfExists {
  case object Replace   extends IfExists
  case object Append    extends IfExists
  case object Exception extends IfExists

  /** reference LoadExistStrategy = replace|append (constants.py:86) */
  def forLoad(s: String): IfExists = s.toLowerCase match {
    case "replace" => Replace
    case "append"  => Append
    case other     => throw new IllegalArgumentException(s"load if_exists must be replace|append, got: $other")
  }

  /** reference ExportExistsStrategy = replace|exception (constants.py:88) */
  def forExport(s: String): IfExists = s.toLowerCase match {
    case "replace"   => Replace
    case "exception" => Exception
    case other       => throw new IllegalArgumentException(s"export if_exists must be replace|exception, got: $other")
  }
}

sealed trait MergeConflict
object MergeConflict {
  /** insert only rows whose key is absent from the target */
  case object Ignore extends MergeConflict
  /** upsert: source wins on key conflict */
  case object Update extends MergeConflict
  /** fail on any key conflict */
  case object Exception extends MergeConflict
  def fromString(s: String): MergeConflict = s.toLowerCase match {
    case "ignore"    => Ignore
    case "update"    => Update
    case "exception" => Exception
    case other       => throw new IllegalArgumentException(s"unknown if_conflicts: $other")
  }
}

/** Column-name capitalization knob (reference: constants.py:93,
  * utils/dataframe.py:17-33).
  */
sealed trait Capitalization
object Capitalization {
  case object Upper    extends Capitalization
  case object Lower    extends Capitalization
  case object Original extends Capitalization
  def fromString(s: String): Capitalization = s.toLowerCase match {
    case "upper"    => Upper
    case "lower"    => Lower
    case "original" => Original
    case other      => throw new IllegalArgumentException(s"unknown capitalization: $other")
  }
}

/** Tiny flat-JSON helper (string values only) so Table/File round-trip
  * without a JSON dependency.
  */
private[model] object Json {
  def esc(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }
  def obj(kvs: (String, String)*): String =
    kvs.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")

  /** Parses a flat string-valued JSON object produced by [[obj]]. */
  def parseFlat(json: String): Map[String, String] = {
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    pair.findAllMatchIn(json).map { m =>
      unesc(m.group(1)) -> unesc(m.group(2))
    }.toMap
  }
  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i  = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o   => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
