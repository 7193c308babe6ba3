package graft.sources

import java.io.FileOutputStream
import java.net.URI
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.jcraft.jsch.{ChannelSftp, JSch, Session}
import org.apache.spark.sql.SparkSession

/** SFTP file location for `load_file` / `get_file_list` (reference:
  * python-sdk/src/astro/files/locations/sftp.py — the reference delegates
  * to paramiko via fsspec's SFTPFileSystem; here the vendored jsch client
  * (`lib/jsch-0.2.17.jar`, BSD) stages the file to local scratch and the
  * distributed read runs over the staged copy, exactly like the HTTP(S)
  * ([[Remote]]) and FTP ([[Ftp]]) locations).
  *
  * Scale note: same stance as FTP — SFTP is a single-stream protocol with
  * no parallel byte-range contract across executors (each executor would
  * need its own authenticated session and the server's disk is the
  * bottleneck anyway). The driver-side staged fetch is the honest shape;
  * an SFTP drop is a small-file ingestion edge, which is exactly what the
  * reference supports it for. Large datasets belong on an object store.
  *
  * Host-key policy: `strictHostKeys = false` by default (the reference's
  * paramiko transport is typically run with AutoAddPolicy in Airflow
  * connections); pass a known_hosts path for pinned-host deployments.
  */
object Sftp {

  def isSftpUrl(path: String): Boolean = path.toLowerCase.startsWith("sftp://")

  private[graft] final case class SftpUrl(
      host: String, port: Int, user: String, pass: String, path: String)

  private[graft] def parse(url: String): SftpUrl = {
    val u = new URI(url)
    require(u.getScheme != null && u.getScheme.equalsIgnoreCase("sftp"),
      s"not an sftp url: $url")
    require(u.getHost != null, s"sftp url without host: $url")
    val (user, pass) = Option(u.getUserInfo) match {
      case Some(ui) =>
        ui.split(":", 2) match {
          case Array(us, pw) => (us, pw)
          case Array(us)     => (us, "")
        }
      case None =>
        (sys.props.getOrElse("user.name", "anonymous"), "")
    }
    SftpUrl(u.getHost, if (u.getPort > 0) u.getPort else 22, user, pass,
      Option(u.getPath).filter(_.nonEmpty).getOrElse("/"))
  }

  private def withChannel[A](
      u: SftpUrl,
      timeoutMs: Int,
      knownHosts: Option[String],
  )(f: ChannelSftp => A): A = {
    val jsch = new JSch()
    knownHosts.foreach(jsch.setKnownHosts)
    val session: Session = jsch.getSession(u.user, u.host, u.port)
    session.setConfig("StrictHostKeyChecking", if (knownHosts.isDefined) "yes" else "no")
    session.setPassword(u.pass)
    session.setTimeout(timeoutMs)
    try {
      session.connect(timeoutMs)
      val ch = session.openChannel("sftp").asInstanceOf[ChannelSftp]
      ch.connect(timeoutMs)
      try f(ch)
      finally ch.disconnect()
    } finally session.disconnect()
  }

  /** Fetch `url` to `<scratchDir>/<sha256(url)>-<basename>` and return the
    * local path — the [[Remote.fetchToScratch]] contract (content-addressed
    * by URL, reused unless `refetch`).
    */
  def fetchToScratch(
      spark: SparkSession,
      url: String,
      scratchDir: String = sys.props("java.io.tmpdir") + "/graft-remote",
      refetch: Boolean = false,
      timeoutMs: Int = 30000,
      knownHosts: Option[String] = None,
  ): String = {
    val u    = parse(url)
    val base = u.path.split('/').lastOption.filter(_.nonEmpty).getOrElse("download")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(url.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    Files.createDirectories(Paths.get(scratchDir))
    val dest = Paths.get(scratchDir, s"$sha-$base")
    if (refetch || !Files.exists(dest)) {
      val tmp = Paths.get(dest.toString + ".part")
      withChannel(u, timeoutMs, knownHosts) { ch =>
        val out = new FileOutputStream(tmp.toFile)
        try ch.get(u.path, out)
        finally out.close()
      }
      Files.move(tmp, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    dest.toString
  }

  /** Names under an sftp:// directory as fully-qualified sftp urls — the
    * `get_file_list` contract for SFTP locations ([[Ftp.list]] parity).
    */
  def list(
      url: String,
      timeoutMs: Int = 30000,
      knownHosts: Option[String] = None,
  ): Seq[String] = {
    val u = parse(url)
    val names = withChannel(u, timeoutMs, knownHosts) { ch =>
      ch.ls(u.path).asScala.toVector
        .collect { case e: ChannelSftp.LsEntry => e.getFilename }
        .filterNot(n => n == "." || n == "..")
    }
    val cred = if (u.pass.isEmpty) u.user else s"${u.user}:${u.pass}"
    val auth = s"sftp://$cred@${u.host}:${u.port}"
    names.sorted.map(n => s"$auth${u.path.stripSuffix("/")}/$n")
  }
}
