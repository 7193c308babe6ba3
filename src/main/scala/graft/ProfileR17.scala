package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TermStats
import graft.similarity.{Ann, Bitext}

/** Dev-only (round 17): phase timing for the VERDICT-r16 item-5 slots —
  * q189_rrf_prod_overlap, q188_bitext_prod_overlap — plus q159_fuzzy_join,
  * each phase behind the noop sink in one warm JVM (guide §1.1/§1.4).
  */
object ProfileR17 {
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
    ops.TableIO.quietKnownLogNoise()

    def timed[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r  = f
      println(f"[p17] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    val which = sys.env.getOrElse("P17_WHICH", "q189,q188,q159,q63").split(",").toSet

    (1 to 2).foreach { round =>
      println(s"=== pass $round ===")

      if (which("q189")) {
        val d     = spark.read.parquet(s"$dir/documents.parquet")
        val e     = spark.read.parquet(s"$dir/embeddings.parquet")
        val c     = timed("q189 e.count (dial)")(math.max(8L, e.count() / 256L).toInt)
        val qText = d.filter(col("doc_id") < 5).select(col("doc_id").as("qid"), col("text"))
        val qVec  = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding"))
        val lex = TermStats.bm25TopK(d, "doc_id", "text", qText, "qid", "text", k = 20)
          .select(col("query_id"), col("rank"), col("doc_id"))
        timed("q189 lex bm25TopK (noop)")(noop(lex))
        val semIvf = Ann.ivfTopK(e, qVec, "vec_id", "embedding", "qid", "embedding",
            k = 20, numCentroids = c, nprobe = 2)
          .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
        timed("q189 semIvf ivfTopK (noop)")(noop(semIvf))
        timed("q189 fuse1+parquet write")(
          TermStats.rrfFuse(lex, semIvf, "doc_id", k = 10)
            .select(col("query_id"), col("doc_id"))
            .write.mode("overwrite").parquet("/tmp/p17_rrf"))
        val semEx = Ann.bruteForceTopK(e, qVec, "vec_id", "embedding", "qid", "embedding", k = 20)
          .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
        timed("q189 semEx bruteForce (noop)")(noop(semEx))
        val prod = spark.read.parquet("/tmp/p17_rrf")
          .dropDuplicates("query_id", "doc_id").withColumn("__hit", lit(1L))
        timed("q189 fuse2+join+agg (noop)")(
          noop(TermStats.rrfFuse(lex, semEx, "doc_id", k = 10)
            .select(col("query_id"), col("doc_id"))
            .join(prod, Seq("query_id", "doc_id"), "left")
            .groupBy(col("query_id"))
            .agg(sum(coalesce(col("__hit"), lit(0L))).as("overlap_at_10"))))
        timed("q189 FULL slot")(SparkEntry.queries("q189_rrf_prod_overlap")(spark, dir).count())
        clear()
      }

      if (which("q188")) {
        val e  = spark.read.parquet(s"$dir/embeddings.parquet")
        val xc = e.where(col("vec_id") % 2 === 0)
          .select(col("vec_id").as("id"), col("embedding").as("v"))
        val yc = e.where(col("vec_id") % 2 =!= 0)
          .select(col("vec_id").as("id"), col("embedding").as("v"))
        val c = timed("q188 yc.count (dial)")(math.max(8L, yc.count() / 256L).toInt)
        timed("q188 minePairsIvf (noop)")(
          noop(Bitext.minePairsIvf(xc, yc, "id", "v", "id", "v",
            k = 4, numCentroids = c, nprobe = 2).select(col("x_id"), col("y_id"))))
        timed("q188 minePairsIvf parquet write")(
          Bitext.minePairsIvf(xc, yc, "id", "v", "id", "v",
            k = 4, numCentroids = c, nprobe = 2)
            .select(col("x_id"), col("y_id"))
            .write.mode("overwrite").parquet("/tmp/p17_bitext"))
        val xs = e.where(col("vec_id") % 2 === 0 && col("vec_id") < 120)
          .select(col("vec_id").as("id"), col("embedding").as("v"))
        timed("q188 exact minePairs (noop)")(
          noop(Bitext.minePairs(xs, yc, xc, "id", "v", "id", "v", k = 4)))
        timed("q188 FULL slot")(SparkEntry.queries("q188_bitext_prod_overlap")(spark, dir).count())
        clear()
      }

      if (which("q159")) {
        val named = spark.read.parquet(s"$dir/customer.parquet").select(
          col("c_custkey"),
          concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 12, "0")).as("code"))
        timed("q159 upstream projection (noop)")(noop(named))
        val keyed = named.select(col("c_custkey").cast("long").as("fz_id"),
          col("code").as("fz_text"),
          expr("substring(code, 1, length(code) - 2)").cast("string").as("fz_block"))
        val capped = keyed
          .withColumn("fz_rn", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("fz_block").orderBy("fz_id")))
          .filter(col("fz_rn") <= 10000)
          .drop("fz_rn")
        timed("q159 capped window (noop)")(noop(capped))
        val a = capped.select(col("fz_block"), col("fz_id").as("id_a"), col("fz_text").as("t_a"))
        val b = capped.select(col("fz_block"), col("fz_id").as("id_b"), col("fz_text").as("t_b"))
        val cand = a.join(b, Seq("fz_block"))
          .filter(col("id_a") < col("id_b"))
          .filter(abs(length(col("t_a")) - length(col("t_b"))) <= 1)
        timed("q159 candidates no-lev (count)")(println("  cand=" + cand.count()))
        timed("q159 FULL slot")(SparkEntry.queries("q159_fuzzy_join")(spark, dir).count())
        clear()
      }

      if (which("q63")) {
        timed("q63 FULL slot")(SparkEntry.queries("q63_stream_stream_join")(spark, dir).count())
        clear()
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
