package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The sweep overlap watcher's sensor as CI (round 16 — ADVICE r15). The
  * round-15 watcher counted `pgrep -f 'graft\.(Verify|Bench)'`, which also
  * matches the sbt LAUNCHER (its argv carries 'runMain graft.Bench'), so a
  * healthy stage already read >=2 JVMs and the >1 threshold could never
  * distinguish overlap from normal operation. The fixed sensor
  * (tools/count_graft_jvms.sh) counts `jps -l` main classes — only forked
  * workers report as `graft.Bench`/`graft.Verify`. These tests feed
  * jps-format fixtures through the script's --stdin mode and assert the
  * warning FIRES when a second worker appears and stays SILENT on the
  * healthy launcher+worker shape.
  */
class OverlapWatcherSpec extends AnyFunSuite {
  private val repo = new java.io.File(".").getCanonicalFile

  private def run(fixture: String, warnLog: Option[java.io.File]): (Int, String) = {
    val args = Seq("bash", "tools/count_graft_jvms.sh", "--stdin") ++
      warnLog.toSeq.flatMap(f => Seq("--warn", f.getAbsolutePath, "1"))
    val pb = new ProcessBuilder(args: _*)
    pb.directory(repo)
    pb.redirectErrorStream(true)
    val p = pb.start()
    p.getOutputStream.write(fixture.getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes()).trim
    p.waitFor()
    (out.toInt, out)
  }

  private val healthyStage =
    """12345 xsbt.boot.Boot
      |12346 graft.Bench
      |99999 jdk.jcmd/sun.tools.jps.Jps
      |""".stripMargin

  private val overlappedStage =
    """12345 xsbt.boot.Boot
      |12346 graft.Bench
      |22222 graft.Verify
      |99999 jdk.jcmd/sun.tools.jps.Jps
      |""".stripMargin

  test("a healthy stage (launcher + one forked worker) counts 1 — the old pgrep sensor read 2") {
    val (n, _) = run(healthyStage, None)
    assert(n == 1)
  }

  test("an idle host with only the launcher counts 0") {
    val (n, _) = run("12345 xsbt.boot.Boot\n", None)
    assert(n == 0)
  }

  test("the warning fires when a second worker JVM appears") {
    val log = Files.createTempFile("overlap", ".log").toFile
    log.deleteOnExit()
    val (n, _) = run(overlappedStage, Some(log))
    assert(n == 2)
    val content = new String(Files.readAllBytes(log.toPath))
    assert(content.contains("OVERLAP WARNING"))
    assert(content.contains("2 graft Verify/Bench worker JVMs"))
  }

  test("the warning stays silent on a healthy stage") {
    val log = Files.createTempFile("overlap", ".log").toFile
    log.deleteOnExit()
    val (n, _) = run(healthyStage, Some(log))
    assert(n == 1)
    assert(Files.readAllBytes(log.toPath).isEmpty,
      "watcher warned on the healthy launcher+worker shape")
  }
}
