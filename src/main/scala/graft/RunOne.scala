package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: run one named SparkEntry query and show result + plan.
  * Usage: runMain graft.RunOne <queryName> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name    = args(0)
    val sfDir   = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val explain = args.contains("explain")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      // SPARK_GRAFT_SHUFFLE_PARTITIONS decouples the shuffle width from the
      // core count for partition-scaling experiments (the q132/q40 recipe:
      // same cores, 32 vs 128 shuffle partitions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reps=N re-runs the query N times in THIS warm JVM and prints each +
    // the min — the isolated re-measure recipe for watch items (cold-JVM
    // single runs bake ~5 s of startup into the number; warm bench slots
    // are what the per-round artifact reports)
    val reps = args.collectFirst { case a if a.startsWith("reps=") => a.drop(5).toInt }.getOrElse(1)
    val fn   = SparkEntry.queries.getOrElse(name, SparkEntry.benchOnly(name))
    val times = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (explain && r == 1) df.explain("formatted")
      val n   = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      println(f"[runone] $name rows=$n in $sec%.1fs")
      sec
    }
    if (reps > 1) println(f"[runone] $name min of $reps: ${times.min}%.2fs")
    spark.stop()
  }
}
