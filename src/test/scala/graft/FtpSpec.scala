package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import graft.model.{File => GFile}
import graft.ops.{GetFileList, LoadFile}

/** `load_file` / `get_file_list` over ftp:// against an in-process RFC 959
  * server (the commands graft.sources.Ftp speaks: USER/PASS, SYST, TYPE,
  * PASV, RETR, NLST, QUIT). The fixture serves a real directory over real
  * sockets — the client's control-channel parsing, PASV data connections,
  * and staging all run for real; only the network is loopback.
  */
object MiniFtpServer {

  final class Handle(val port: Int, server: ServerSocket, thread: Thread) {
    def close(): Unit = {
      try server.close() catch { case _: Throwable => }
      thread.interrupt()
    }
  }

  /** Serve `root` read-only on an ephemeral port; returns the handle. */
  def start(root: Path, user: String = "anonymous", pass: String = ""): Handle = {
    val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        val h    = new Thread(() => session(sock, root, user, pass))
        h.setDaemon(true)
        h.start()
      } catch { case _: Throwable => /* server closed */ }
    })
    t.setDaemon(true)
    t.start()
    new Handle(server.getLocalPort, server, t)
  }

  private def session(sock: Socket, root: Path, user: String, pass: String): Unit = {
    val in  = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.ISO_8859_1))
    val out = new PrintWriter(sock.getOutputStream, false, StandardCharsets.ISO_8859_1)
    def send(s: String): Unit = { out.print(s + "\r\n"); out.flush() }
    var dataListener: ServerSocket = null
    def resolve(p: String): Path = {
      val rel = p.stripPrefix("/")
      root.resolve(rel).normalize()
    }
    try {
      send("220 mini-ftp ready")
      var line = in.readLine()
      while (line != null) {
        val (cmd, arg) = line.split(" ", 2) match {
          case Array(c, a) => (c.toUpperCase, a)
          case Array(c)    => (c.toUpperCase, "")
        }
        cmd match {
          case "USER" =>
            if (arg == user && pass.isEmpty) send("230 ok") else send("331 need password")
          case "PASS" =>
            if (pass.isEmpty || arg == pass) send("230 logged in") else send("530 bad login")
          case "SYST" => send("215 UNIX Type: L8")
          case "TYPE" => send("200 type set")
          case "PASV" =>
            if (dataListener != null) dataListener.close()
            dataListener = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
            val p = dataListener.getLocalPort
            send(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
          case "RETR" =>
            val f = resolve(arg)
            if (dataListener == null) send("425 use PASV first")
            else if (!Files.isRegularFile(f)) send(s"550 no such file: $arg")
            else {
              send("150 opening data connection")
              val d = dataListener.accept()
              try Files.copy(f, d.getOutputStream)
              finally { d.close(); dataListener.close(); dataListener = null }
              send("226 transfer complete")
            }
          case "NLST" =>
            val dir = if (arg.isEmpty) root else resolve(arg)
            if (dataListener == null) send("425 use PASV first")
            else {
              send("150 here comes the listing")
              val d = dataListener.accept()
              try {
                val w = new PrintWriter(d.getOutputStream, false, StandardCharsets.UTF_8)
                if (Files.isDirectory(dir)) {
                  Files.list(dir).forEach(p => w.print(p.getFileName.toString + "\r\n"))
                } else if (Files.exists(dir)) w.print(dir.getFileName.toString + "\r\n")
                w.flush()
              } finally { d.close(); dataListener.close(); dataListener = null }
              send("226 listing complete")
            }
          case "QUIT" =>
            send("221 bye")
            return
          case _ => send(s"502 not implemented: $cmd")
        }
        line = in.readLine()
      }
    } catch {
      case _: Throwable => // connection dropped
    } finally {
      if (dataListener != null) dataListener.close()
      try sock.close() catch { case _: Throwable => }
    }
  }
}

class FtpSpec extends SparkSpec {

  private def withServer[A](files: Map[String, String])(f: (MiniFtpServer.Handle, Path) => A): A = {
    val root = Paths.get(tmpDir())
    files.foreach { case (name, content) =>
      val p = root.resolve(name)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    }
    val h = MiniFtpServer.start(root)
    try f(h, root)
    finally h.close()
  }

  test("load_file reads a csv over ftp:// (staged fetch, distributed read)") {
    withServer(Map("drop/data.csv" -> "id,name\n1,alpha\n2,beta\n")) { (h, _) =>
      val df = LoadFile.toDataFrame(spark,
        GFile(s"ftp://127.0.0.1:${h.port}/drop/data.csv"))
      assert(df.columns.toSeq === Seq("id", "name"))
      assert(df.count() === 2)
      assert(df.where("id = 2").head().getString(1) === "beta")
    }
  }

  test("staged copy is content-addressed: second load reuses it") {
    withServer(Map("a.csv" -> "x\n1\n")) { (h, _) =>
      val url   = s"ftp://127.0.0.1:${h.port}/a.csv"
      val p1    = graft.sources.Ftp.fetchToScratch(spark, url)
      val mtime = Files.getLastModifiedTime(Paths.get(p1))
      val p2    = graft.sources.Ftp.fetchToScratch(spark, url)
      assert(p1 === p2)
      assert(Files.getLastModifiedTime(Paths.get(p2)) === mtime)
    }
  }

  test("get_file_list over ftp:// lists directory entries as ftp urls") {
    withServer(Map(
      "drop/a.csv" -> "x\n1\n",
      "drop/b.csv" -> "x\n2\n",
    )) { (h, _) =>
      val urls = GetFileList(spark, s"ftp://127.0.0.1:${h.port}/drop")
      assert(urls.map(_.split('/').last).sorted === Seq("a.csv", "b.csv"))
      assert(urls.forall(_.startsWith(s"ftp://127.0.0.1:${h.port}/")))
    }
  }

  test("missing file fails with the server's 550, not a hang") {
    withServer(Map.empty[String, String]) { (h, _) =>
      val e = intercept[java.io.IOException] {
        graft.sources.Ftp.fetchToScratch(spark, s"ftp://127.0.0.1:${h.port}/nope.csv",
          refetch = true)
      }
      assert(e.getMessage.contains("550") || e.getMessage.contains("RETR"))
    }
  }

  test("gdrive:// still fails fast with an actionable message") {
    val e = intercept[UnsupportedOperationException] {
      LoadFile.toDataFrame(spark, GFile("gdrive://folder/x.csv"))
    }
    assert(e.getMessage.contains("gdrive://"))
  }
}
