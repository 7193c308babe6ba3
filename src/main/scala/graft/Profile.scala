package graft
import graft.model.File
import graft.ops.LoadFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate the slow ingredient in hash-key aggregations. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = LoadFile.toDataFrame(spark, File(s"$dir/documents.parquet")).cache()
    time("warmup count")(docs.count())
    time("groupBy plain col")(docs.groupBy(col("lang")).agg(min("doc_id")).count())
    time("groupBy md5(text) raw")(docs.groupBy(md5(col("text").cast("binary"))).agg(min("doc_id")).count())
    time("groupBy xxhash64(text)")(docs.groupBy(xxhash64(col("text"))).agg(min("doc_id")).count())
    time("regexp project only")(docs.select(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).count())
    time("groupBy regexp key")(docs.groupBy(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).agg(min("doc_id")).count())
    time("groupBy regexp key again")(docs.groupBy(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).agg(min("doc_id")).count())
    time("project regexp then groupBy")(
      docs.select(col("doc_id"), regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("k"))
        .groupBy("k").agg(min("doc_id")).count())
    time("groupBy substring key")(docs.groupBy(substring(lower(trim(col("text"))), 1, 20)).agg(min("doc_id")).count())
    time("groupBy simple-regex key")(docs.groupBy(regexp_replace(col("text"), "a", "b")).agg(min("doc_id")).count())
    time("split project")(docs.select(split(trim(col("text")), "\\s+")).count())
    time("split+hash project")(docs.select(transform(split(trim(col("text")), "\\s+"), t => xxhash64(t))).count())
    spark.stop()
  }
}
