package graft
import graft.dedup.Dedup
import graft.functions.NativeFunctions
import graft.model.File
import graft.ops.LoadFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: isolate the slow ingredient of the near-dup pipelines. */
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
      concat(col("text"), lit(" zz")).as("text"))
    val docs = d.unionByName(dup).cache()
    time("warmup count")(docs.count())
    val withSim = docs.select(col("doc_id").as("id"), NativeFunctions.simHash64(col("text")).as("sim"))
    time("simhash project")(withSim.count())
    val chunks = 4; val width = 16
    val blocked = withSim.select(col("id"), col("sim"),
      posexplode(array((0 until chunks).map { j =>
        shiftrightunsigned(col("sim"), j * width).bitwiseAND(lit((1L << width) - 1))
      }: _*))).toDF("id", "sim", "chunk", "val")
    time("blocked explode")(blocked.count())
    val capped = blocked.withColumn("__bsz",
      count(lit(1)).over(Window.partitionBy(col("chunk"), col("val"))))
      .where(col("__bsz") <= 1000).drop("__bsz")
    time("bucket cap window")(capped.count())
    val a = capped.select(col("chunk"), col("val"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = capped.select(col("chunk"), col("val"), col("id").as("id_b"), col("sim").as("sim_b"))
    val joined = a.join(b, Seq("chunk", "val")).where(col("id_a") < col("id_b"))
    time("chunk join")(println("  raw: " + joined.count()))
    val dd = joined.dropDuplicates("id_a", "id_b")
    time("dedup pairs")(println("  uniq: " + dd.count()))
    val ver = dd.withColumn("hamming", call_function("bit_count", col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= 3)
    time("hamming verify")(println("  verified: " + ver.count()))
    time("full q13 pipeline")(Dedup.nearDupPairsSimHash(docs, "doc_id", "text", maxHamming = 3).count())
    spark.stop()
  }
}
