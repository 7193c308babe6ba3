package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev-only (round 16): phase-level timing for the CC dedup family.
  * Times each sub-pipeline of q77/q78/q110/q111 with the noop sink
  * (guide §1.4) in one warm JVM, 3 reps each, min reported.
  */
object ProfileR16 {
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
    import spark.implicits._

    def corpus: DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 5 === 0)
      val b = d.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" chain link one two three")).as("text"))
      val c = b.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" more drift four five six")).as("text"))
      d.unionByName(b).unionByName(c)
    }

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"prof-$name")
        mk.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        s
      }
      println(f"[prof] $name%-28s min=${ts.min}%6.2fs  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // warm JIT on the full slot once
    val t0 = System.nanoTime()
    SparkEntry.queries("q77_dedup_transitive_prod")(spark, dir).count()
    println(f"[prof] q77 full (cold-ish)        ${(System.nanoTime() - t0) / 1e9}%6.2fs")

    time("pairs_prod_r4")(Dedup.nearDupPairsMinHash(corpus, "doc_id", "text",
      threshold = 0.5, bands = 32))
    time("pairs_exact_r2")(Dedup.nearDupPairsMinHash(corpus, "doc_id", "text",
      threshold = 0.5, bands = Dedup.recallExactBands(0.5)))
    // CC over prod pairs / exact pairs
    time("cc_on_prod_pairs") {
      Dedup.connectedComponents(Dedup.nearDupPairsMinHash(corpus, "doc_id", "text",
        threshold = 0.5, bands = 32))
    }
    time("cc_on_exact_pairs") {
      Dedup.connectedComponents(Dedup.nearDupPairsMinHash(corpus, "doc_id", "text",
        threshold = 0.5, bands = Dedup.recallExactBands(0.5)))
    }
    // CC alone on pinned pairs (pairs precomputed to parquet)
    val pp = "/root/repo/target/prof_pairs_prod"
    Dedup.nearDupPairsMinHash(corpus, "doc_id", "text", threshold = 0.5, bands = 32)
      .write.mode("overwrite").parquet(pp)
    time("cc_alone_prod_pairs")(Dedup.connectedComponents(spark.read.parquet(pp)))
    val pe = "/root/repo/target/prof_pairs_exact"
    Dedup.nearDupPairsMinHash(corpus, "doc_id", "text", threshold = 0.5,
      bands = Dedup.recallExactBands(0.5))
      .write.mode("overwrite").parquet(pe)
    time("cc_alone_exact_pairs")(Dedup.connectedComponents(spark.read.parquet(pe)))

    val full = (1 to 3).map { _ =>
      val t = System.nanoTime()
      SparkEntry.queries("q77_dedup_transitive_prod")(spark, dir).count()
      (System.nanoTime() - t) / 1e9
    }
    println(f"[prof] q77 full warm             min=${full.min}%6.2fs  runs=${full.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
