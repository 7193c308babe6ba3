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

  def apply(name: String): Table = Table(name, Metadata(), temp = false)
}

final case class Table(name: String, metadata: Metadata, temp: Boolean) {
  /** Fully-qualified name inside the Spark catalog (database.table). */
  def qualifiedName: String =
    metadata.database.orElse(metadata.schema) match {
      case Some(db) => s"`$db`.`$name`"
      case None     => s"`$name`"
    }
  def uri: String = s"graft://tables/${metadata.database.getOrElse("default")}/$name"
}

/** File formats the engine loads/exports (reference: constants.py:36-47).
  * xls/xlsx have no bundled Spark source in this environment; they are
  * accepted by the dispatcher and rejected with a clear error at read time.
  */
sealed abstract class FileType(val name: String, val extensions: Seq[String])
object FileType {
  case object Csv     extends FileType("csv", Seq("csv"))
  case object Json    extends FileType("json", Seq("json"))
  case object Ndjson  extends FileType("ndjson", Seq("ndjson", "jsonl"))
  case object Parquet extends FileType("parquet", Seq("parquet", "pq"))
  case object Xlsx    extends FileType("xlsx", Seq("xlsx", "xls"))

  val all: Seq[FileType] = Seq(Csv, Json, Ndjson, Parquet, Xlsx)

  /** Extension-dispatched type detection
    * (reference: python-sdk/src/astro/files/types/__init__.py:52-78).
    */
  def fromPath(path: String): Option[FileType] = {
    val base = path.stripSuffix("/").split('/').lastOption.getOrElse("")
    val ext  = base.split('.').drop(1).lastOption.map(_.toLowerCase)
    ext.flatMap(e => all.find(_.extensions.contains(e)))
  }
}

object File {
  def apply(path: String): File = File(path, None)
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
  def uri: String = if (path.contains("://")) path else s"file://$path"
}

/** Strategy literals (reference: python-sdk/src/astro/constants.py:86-95). */
sealed trait IfExists
object IfExists {
  case object Replace   extends IfExists
  case object Append    extends IfExists
  case object Exception extends IfExists
  def fromString(s: String): IfExists = s.toLowerCase match {
    case "replace"   => Replace
    case "append"    => Append
    case "exception" => Exception
    case other       => throw new IllegalArgumentException(s"unknown if_exists: $other")
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
}
