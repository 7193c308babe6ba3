package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: find which earlier bench query slows q29 down.
  * args: <preRunNamesCsv|none> [sfDirForQ29]
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val pre   = if (args.nonEmpty && args(0) != "none") args(0).split(",").toSeq else Seq.empty
    val dir   = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val qs = SparkEntry.queries
    pre.foreach { n =>
      time(s"pre $n")(try qs(n)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"  pre $n failed: ${e.getMessage.take(120)}") })
    }
    (1 to 2).foreach { r =>
      time(s"q29 round $r at $dir")(
        println("  rows: " + qs("q29_dedup_transitive")(spark, dir).count()))
    }
    spark.stop()
  }
}
