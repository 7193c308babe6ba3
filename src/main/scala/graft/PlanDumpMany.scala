package graft
import java.io.{File, FileOutputStream, PrintStream}
import org.apache.spark.sql.SparkSession

/** Dev helper (round 17): dump `.explain("formatted")` for a list of slots
  * into `<outDir>/<slot>_<suffix>.txt` in ONE warm JVM — the committed
  * before/after plan evidence without one cold sbt launch per slot.
  *
  * Usage: runMain graft.PlanDumpMany <outDir> <suffix> <slot> [slot...]
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  *
  * The special slot name `x_semantic_dedup` dumps the plan of
  * [[graft.dedup.Dedup.semanticDedup]] over the embeddings fixture — a
  * declared public operator no oracle query routes through, whose round-17
  * salt/cache parity change needs plan evidence of its own.
  */
object PlanDumpMany {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val slots  = args.drop(2)
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ops.TableIO.quietKnownLogNoise()
    new File(outDir).mkdirs()
    slots.foreach { name =>
      val df = () =>
        if (name == "x_semantic_dedup") {
          val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          graft.dedup.Dedup.semanticDedup(e, "vec_id", "embedding",
            threshold = 0.95, numCentroids = 8)
        } else SparkEntry.queries.getOrElse(name, SparkEntry.benchOnly(name))(spark, sfDir)
      val ps     = new PrintStream(new FileOutputStream(s"$outDir/${name}_$suffix.txt"))
      val oldOut = System.out
      try {
        System.setOut(ps)
        Console.withOut(ps) { df().explain("formatted") }
      } catch { case e: Throwable => ps.println(s"EXPLAIN FAILED: $e") }
      finally { System.setOut(oldOut); ps.close() }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      System.err.println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
    sys.exit(0)
  }
}
