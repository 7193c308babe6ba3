package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Location dispatch: every object-store / filesystem scheme resolves
  * through Hadoop FS (reference location registry:
  * python-sdk/src/astro/files/locations/base.py:139-153 — per-location
  * classes collapse into the scheme string here, since Spark executors read
  * object stores directly).
  *
  * Two failure classes get TYPED errors instead of raw Hadoop internals:
  *  - `gdrive://` — the one reference location with no Hadoop FS analog
  *    (needs Google Drive API OAuth; unreachable from a zero-egress build).
  *  - any scheme with no registered FileSystem (e.g. `wasbs://` without the
  *    azure connector jars) — Hadoop's "No FileSystem for scheme" /
  *    UnsupportedFileSystemException is rewritten into an actionable
  *    message naming the scheme and the fix.
  */
object Locations {

  /** Fail fast on locations this build can never serve. */
  def requireSupported(path: String): Unit =
    if (path.toLowerCase.startsWith("gdrive://"))
      throw new UnsupportedOperationException(
        "gdrive:// locations are not supported in this build " +
          "(reference parity gap: needs Google Drive API credentials); " +
          "stage the file to local/s3a/gs/http(s)/ftp/sftp instead")

  /** Hadoop FileSystem for `path`, with unsupported-scheme failures
    * translated into a typed, actionable error.
    */
  def fileSystemFor(conf: Configuration, p: Path): FileSystem = {
    requireSupported(p.toString)
    try p.getFileSystem(conf)
    catch {
      // Hadoop signals an unserved scheme three ways depending on version
      // and whether core-default maps the scheme to an absent class:
      // UnsupportedFileSystemException, IOException("No FileSystem for
      // scheme"), or RuntimeException(ClassNotFoundException)
      case e: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        throw unsupportedScheme(p, e)
      case e: java.io.IOException
          if Option(e.getMessage).exists(_.contains("No FileSystem for scheme")) =>
        throw unsupportedScheme(p, e)
      case e: RuntimeException
          if e.getCause.isInstanceOf[ClassNotFoundException] =>
        throw unsupportedScheme(p, e)
    }
  }

  private def unsupportedScheme(p: Path, cause: Throwable): Throwable =
    new UnsupportedOperationException(
      s"location scheme '${Option(p.toUri.getScheme).getOrElse("")}://' has no FileSystem " +
        "registered in this build — use file/s3a/gs/abfs with the provider jar on the " +
        "classpath (fs.<scheme>.impl), or an http(s)/ftp/sftp staged source", cause)
}
