package graft
import graft.dedup.Dedup
import graft.functions.NativeFunctions
import graft.functions.TextFunctions._
import graft.model.File
import graft.ops.LoadFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: isolate the slow ingredient of the near-dup pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val d   = LoadFile.toDataFrame(spark, File(s"$dir/documents.parquet")).select(col("doc_id"), col("text"))
    val dup = d.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" extra trailing token")).as("text"))
    val docs = d.unionByName(dup).cache()
    time("warmup count")(docs.count())
    val sets = docs.select(col("doc_id").as("id"), NativeFunctions.shingleHashes(col("text"), 3).as("sh"))
    time("shingle sets")(sets.count())
    val sig = sets.select(col("id"), NativeFunctions.minHashSignature(col("sh"), 128).as("sig"))
    time("minhash sig")(sig.count())
    val banded = sets.select(col("id"),
      posexplode(NativeFunctions.bandBuckets(NativeFunctions.minHashSignature(col("sh"), 128), 32)))
      .toDF("id", "band", "bucket")
    time("banded explode")(banded.count())
    val capped = banded.withColumn("__bsz",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .where(col("__bsz") <= 1000).drop("__bsz")
    time("bucket cap window")(capped.count())
    val a = capped.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    time("raw candidate join")(println("  raw pairs: " + cand.count()))
    val dd = cand.dropDuplicates("id_a", "id_b")
    time("dedup candidates")(println("  uniq pairs: " + dd.count()))
    val verified = dd
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= 0.6)
    time("jaccard verify")(println("  verified: " + verified.count()))
    time("full q12 pipeline")(Dedup.nearDupPairsMinHash(docs, "doc_id", "text", threshold = 0.6).count())
    spark.stop()
  }
}
