package graft.sources

import java.io.{BufferedReader, FileOutputStream, InputStream, InputStreamReader, PrintWriter}
import java.net.{InetSocketAddress, Socket, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** FTP file location for `load_file` / `get_file_list` (reference:
  * python-sdk/src/astro/files/locations/ftp.py — the reference delegates to
  * fsspec's FTPFileSystem; here a minimal RFC 959 client over `java.net.
  * Socket` — passive mode, binary type — stages the file to local scratch
  * and the distributed read runs over the staged copy, exactly like the
  * HTTP(S) location in [[Remote]]).
  *
  * Scale note: FTP is a single-stream control+data protocol with no
  * parallel byte-range contract — the driver-side staged fetch is the
  * honest shape (same stance as HTTP). Large datasets belong on an object
  * store; an FTP drop is a small-file ingestion edge, which is exactly what
  * the reference supports it for.
  *
  * Pure JDK by necessity and by design: commons-net is not on this build's
  * classpath, and the subset needed (USER/PASS, TYPE I, PASV/EPSV, RETR,
  * NLST) is ~150 lines against a public RFC.
  */
object Ftp {

  def isFtpUrl(path: String): Boolean = path.toLowerCase.startsWith("ftp://")

  private[sources] final case class FtpUrl(
      host: String, port: Int, user: String, pass: String, path: String)

  private[sources] def parse(url: String): FtpUrl = {
    val u = new URI(url)
    require(u.getScheme != null && u.getScheme.equalsIgnoreCase("ftp"), s"not an ftp url: $url")
    val (user, pass) = Option(u.getUserInfo) match {
      case Some(ui) =>
        ui.split(":", 2) match {
          case Array(us, pw) => (us, pw)
          case Array(us)     => (us, "")
        }
      case None => ("anonymous", "anonymous@")
    }
    FtpUrl(u.getHost, if (u.getPort > 0) u.getPort else 21, user, pass,
      Option(u.getPath).filter(_.nonEmpty).getOrElse("/"))
  }

  /** One control-channel session. Not thread-safe; use-and-close. */
  private final class Client(host: String, port: Int, timeoutMs: Int) {
    private val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), timeoutMs)
    sock.setSoTimeout(timeoutMs)
    private val in  = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.ISO_8859_1))
    private val out = new PrintWriter(sock.getOutputStream, false, StandardCharsets.ISO_8859_1)

    /** Read one (possibly multiline `nnn-…` … `nnn ␠`) reply; return (code, last line). */
    def reply(): (Int, String) = {
      var line = in.readLine()
      if (line == null) throw new java.io.IOException("FTP control channel closed")
      if (line.length >= 4 && line.charAt(3) == '-') {
        val code = line.substring(0, 3)
        while (line != null && !(line.startsWith(code) && line.length >= 4 && line.charAt(3) == ' '))
          line = in.readLine()
        if (line == null) throw new java.io.IOException("FTP control channel closed mid-reply")
      }
      (line.substring(0, 3).toInt, line)
    }

    def cmd(c: String): (Int, String) = {
      out.print(c + "\r\n"); out.flush()
      reply()
    }

    def expect(c: String, ok: Int => Boolean): String = {
      val (code, line) = cmd(c)
      if (!ok(code)) throw new java.io.IOException(s"FTP `$c` failed: $line")
      line
    }

    def login(user: String, pass: String): Unit = {
      val (greet, gline) = reply()
      if (greet != 220) throw new java.io.IOException(s"FTP greeting: $gline")
      val (code, line) = cmd(s"USER $user")
      code match {
        case 230 => // logged in without password
        case 331 => expect(s"PASS $pass", _ == 230)
        case _   => throw new java.io.IOException(s"FTP USER failed: $line")
      }
      expect("TYPE I", _ == 200)
    }

    /** PASV → data-connection socket. */
    def pasvConnect(): Socket = {
      val line = expect("PASV", _ == 227)
      // 227 Entering Passive Mode (h1,h2,h3,h4,p1,p2)
      val m = "\\((\\d+),(\\d+),(\\d+),(\\d+),(\\d+),(\\d+)\\)".r
        .findFirstMatchIn(line)
        .getOrElse(throw new java.io.IOException(s"unparseable PASV reply: $line"))
      val dataHost = (1 to 4).map(m.group).mkString(".")
      val dataPort = m.group(5).toInt * 256 + m.group(6).toInt
      val s = new Socket()
      // Servers behind NAT often advertise an unroutable PASV host; like
      // most clients, fall back to the control-channel host in that case.
      try s.connect(new InetSocketAddress(dataHost, dataPort), timeoutMs)
      catch {
        case _: java.io.IOException =>
          s.connect(new InetSocketAddress(host, dataPort), timeoutMs)
      }
      s.setSoTimeout(timeoutMs)
      s
    }

    /** Run `c` over a PASV data connection, handing the stream to `f`. */
    def retrieve[A](c: String)(f: InputStream => A): A = {
      val data = pasvConnect()
      try {
        val (code, line) = cmd(c)
        if (code != 150 && code != 125)
          throw new java.io.IOException(s"FTP `$c` failed: $line")
        val a = f(data.getInputStream)
        data.close()
        val (done, dline) = reply()
        if (done != 226 && done != 250)
          throw new java.io.IOException(s"FTP `$c` transfer incomplete: $dline")
        a
      } finally data.close()
    }

    def close(): Unit = {
      try { out.print("QUIT\r\n"); out.flush() } catch { case _: Throwable => }
      sock.close()
    }
  }

  private def withClient[A](u: FtpUrl, timeoutMs: Int)(f: Client => A): A = {
    val c = new Client(u.host, u.port, timeoutMs)
    try {
      c.login(u.user, u.pass)
      f(c)
    } finally c.close()
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
  ): String = {
    val u    = parse(url)
    val base = u.path.split('/').lastOption.filter(_.nonEmpty).getOrElse("download")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(url.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    Files.createDirectories(Paths.get(scratchDir))
    val dest = Paths.get(scratchDir, s"$sha-$base")
    if (refetch || !Files.exists(dest)) {
      val tmp = Paths.get(dest.toString + ".part")
      withClient(u, timeoutMs) { c =>
        c.retrieve(s"RETR ${u.path}") { inStream =>
          val outStream = new FileOutputStream(tmp.toFile)
          try inStream.transferTo(outStream)
          finally outStream.close()
        }
      }
      Files.move(tmp, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    dest.toString
  }

  /** Names under an ftp:// directory (NLST) as fully-qualified ftp urls —
    * the `get_file_list` contract for FTP locations.
    */
  def list(url: String, timeoutMs: Int = 30000): Seq[String] = {
    val u = parse(url)
    val names = withClient(u, timeoutMs) { c =>
      c.retrieve(s"NLST ${u.path}") { inStream =>
        val r = new BufferedReader(new InputStreamReader(inStream, StandardCharsets.UTF_8))
        Iterator.continually(r.readLine()).takeWhile(_ != null).toVector
      }
    }
    val auth =
      if (u.user == "anonymous") s"ftp://${u.host}:${u.port}"
      else s"ftp://${u.user}:${u.pass}@${u.host}:${u.port}"
    names.filter(_.nonEmpty).map { n =>
      if (n.startsWith("/")) s"$auth$n"
      else s"$auth${u.path.stripSuffix("/")}/$n"
    }
  }
}
