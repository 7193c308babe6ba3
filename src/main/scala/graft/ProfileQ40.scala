package graft
import graft.functions.NativeFunctions
import graft.model.File
import graft.ops.LoadFile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev-only: stage-band the q40_neardup_ngram_prod residual (round-13
  * task 3). Each stage count recomputes its upstream, so stage cost =
  * delta to the previous line. Args: sfDir [shufflePartitions].
  */
object ProfileQ40 {
  def main(args: Array[String]): Unit = {
    val dir   = if (args.nonEmpty) args(0) else "/root/repo/scratch/sf10"
    val parts = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q40|$parts] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val finalOnly = args.contains("finalOnly")
    val d0 = LoadFile.toDataFrame(spark, File(s"$dir/documents.parquet"))
      .select(col("doc_id"), col("text")).filter(col("doc_id") % 5 === 0)
    val dup = d0.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" extra trailing token")).as("text"))
    val docs = d0.unionByName(dup)
    val sets = docs.select(col("doc_id").as("id"),
      NativeFunctions.charNgramHashes(col("text"), 5).as("sh"))
    if (!finalOnly) {
      time("scan+union")(println("  docs: " + docs.count()))
      time("ngram sets")(println("  sets: " + sets.count()))
      val avgSh = sets.select(org.apache.spark.sql.functions.avg(size(col("sh"))))
        .first().getDouble(0)
      println(f"  avg |sh| = $avgSh%.0f hashes/doc")
    }
    val banded = sets.select(col("id"),
      posexplode(NativeFunctions.bandBuckets(
        NativeFunctions.minHashSignature(col("sh"), 128), 32)))
      .toDF("id", "band", "bucket")
    if (!finalOnly) time("banded")(println("  banded: " + banded.count()))
    val over = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bsz")).where(col("__bsz") > 64)
      .select(col("band").as("__ob"), col("bucket").as("__obk"))
    val capped = banded.join(over,
      col("band") <=> col("__ob") && col("bucket") <=> col("__obk"), "left_anti")
    if (!finalOnly) time("capped")(println("  capped: " + capped.count()))
    val a = capped.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id_b"))
    val rawPairs = a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b")).select(col("id_a"), col("id_b"))
    if (!finalOnly) time("raw pairs")(println("  raw: " + rawPairs.count()))
    val candidates = rawPairs.dropDuplicates("id_a", "id_b")
    if (!finalOnly) time("uniq candidates")(println("  uniq: " + candidates.count()))
    val shj   = args.contains("shj")
    val lenf  = args.contains("lenfilter")
    def side(idAs: String, shAs: String) = {
      val s0 = sets.select(col("id").as(idAs), col("sh").as(shAs))
      if (shj) s0.hint("SHUFFLE_HASH") else s0
    }
    val survivors =
      if (!lenf) candidates
      else {
        val sizes = sets.select(col("id"), size(col("sh")).as("n"))
        val filtered = candidates
          .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
          .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
          .where(least(col("na"), col("nb")) >= greatest(col("na"), col("nb")) * 0.9)
          .select(col("id_a"), col("id_b"))
        time("length filter")(println("  survivors: " + filtered.count()))
        filtered
      }
    val withA = survivors.join(side("id_a", "sh_a"), Seq("id_a"))
    if (!finalOnly) time("join sh_a")(println("  a-joined: " + withA.count()))
    val full = withA
      .join(side("id_b", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", NativeFunctions.jaccardSorted(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= 0.9)
    time(s"verify full shj=$shj lenf=$lenf")(println("  verified: " + full.count()))
    spark.stop()
  }
}
