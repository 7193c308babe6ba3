package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Clustering

/** Dev-only (round 16): phase timing for q168_semdedup — spreadInit,
  * kmeans iterations, and the within-cell pair join, each with the noop
  * sink in one warm JVM.
  */
object ProfileSemR16 {
  def main(args: Array[String]): Unit = {
    val dir   = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus: DataFrame = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"), col("embedding"))
      e.unionByName(e.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    }

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[sem] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    // full slot warm-up
    timed("q168 full (1st)")(SparkEntry.queries("q168_semdedup")(spark, dir).count())
    timed("q168 full (2nd)")(SparkEntry.queries("q168_semdedup")(spark, dir).count())

    (1 to 2).foreach { r =>
      val init  = timed(s"spreadInit r$r")(Clustering.spreadInit(corpus, "vec_id", "embedding", k = 8))
      val (assigned, model) = timed(s"kmeans 2 iters r$r")(
        Clustering.kmeans(corpus, "vec_id", "embedding", init, iters = 2))
      timed(s"assigned count r$r")(assigned.count())
      timed(s"semDedup full r$r")(
        Clustering.semDedup(corpus, "vec_id", "embedding", init, iters = 2, threshold = 0.95)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
    sys.exit(0)
  }
}
