package graft

// Throwaway verification driver (deleted after the run): exercises the new
// public surfaces exactly as a library user would.
import graft.model._
import graft.ops.{ExportToFile, LoadFile}
import org.apache.spark.sql.SparkSession

object DemoScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. xlsx: export a DataFrame, read it back through load_file
    val df = Seq((1L, "alice & <bob>", 1.5), (2L, "höla", -2.0)).toDF("id", "name", "score")
    ExportToFile.df(spark, df, File("/tmp/demo_out.xlsx"), IfExists.Replace)
    val back = LoadFile.toDataFrame(spark, File("/tmp/demo_out.xlsx"))
    println("[demo] xlsx schema: " + back.schema.simpleString)
    back.orderBy("id").collect().foreach(r => println("[demo] xlsx row: " + r))

    // 2. HTTP: load_file from a URL served by the fixture server (arg 0 = port)
    val port = args(0)
    val http = LoadFile.toDataFrame(spark, File(s"http://127.0.0.1:$port/fixture.csv"))
    println("[demo] http rows: " + http.count() + " cols: " + http.columns.mkString(","))

    // 3. multimodal: decode + features over binary payloads
    val imgs = df.select($"id", org.apache.spark.sql.functions.encode($"name", "UTF-8").as("bytes"))
    val meta = graft.multimodal.Multimodal.decodeImageMeta(imgs, "bytes")
    meta.select("id", "meta.width", "meta.height", "meta.format").collect()
      .foreach(r => println("[demo] meta: " + r))
    spark.stop()
  }
}
