package graft
import org.apache.spark.sql.SparkSession

/** Dev-only (round 16): bench a named subset of slots in ONE warm JVM —
  * per-slot warm-up at sf0.01, then min-of-3 at the target SF, mimicking
  * the driver's protocol (local[$SPARK_GRAFT_CPUS], shuffle partitions =
  * cpus, unpersist between passes). Usage:
  *   runMain graft.BenchSomeR16 <sfDir> slot1 slot2 ...
  */
object BenchSomeR16 {
  def main(args: Array[String]): Unit = {
    val dir   = args(0)
    val slots = args.drop(1)
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ops.TableIO.quietKnownLogNoise()
    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    slots.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, SparkEntry.benchOnly(name))
      (1 to 2).foreach { _ => fn(spark, "/root/testdata/sf0.01").count(); clear() }
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        clear()
        (s, rows)
      }
      println(f"[benchsome] $name%-30s min=${ts.map(_._1).min}%7.2fs rows=${ts.head._2} runs=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
    sys.exit(0)
  }
}
