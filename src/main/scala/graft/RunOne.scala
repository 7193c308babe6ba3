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
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries.getOrElse(name, SparkEntry.benchOnly(name))(spark, sfDir)
    if (explain) df.explain("formatted")
    val n = df.count()
    println(f"[runone] $name rows=$n in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
