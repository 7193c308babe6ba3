package graft.streaming

import graft.model.{File, FileType, Table}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Autoloader-style streaming load (reference: the Databricks `load_file`
  * native path generates an Autoloader job —
  * python-sdk/src/astro/databases/databricks/load_file/load_file_job.py:37-166,
  * `cloudFiles` source at :77,115).
  *
  * Spark-first: a Structured Streaming file source with
  * `Trigger.AvailableNow` gives the same semantics — incremental discovery of
  * new files under a prefix, exactly-once into a table, resumable via the
  * checkpoint. `maxFilesPerTrigger` bounds per-batch work at scale.
  */
object StreamingLoad {

  /** Start an incremental file→table load and (for AvailableNow) wait for it
    * to drain. Returns the output table pointer.
    */
  def run(
      spark: SparkSession,
      input: File,
      schema: StructType,
      output: Table,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      await: Boolean = true,
  ): Table = {
    val ft = input.resolvedType.getOrElse(FileType.Parquet)
    // Spark's streaming file source only accepts directories. A single-file
    // input streams from its parent directory with a pathGlobFilter pinned
    // to the file name (same trick the Autoloader docs recommend).
    val p  = new org.apache.hadoop.fs.Path(input.path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (sourceDir, globFilter) =
      if (fs.exists(p) && fs.getFileStatus(p).isFile) (p.getParent.toString, Some(p.getName))
      else (input.path, None)
    var reader = spark.readStream.schema(schema)
    globFilter.foreach(g => reader = reader.option("pathGlobFilter", g))
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val df: DataFrame = ft match {
      case FileType.Csv     => reader.option("header", "true").csv(sourceDir)
      case FileType.Ndjson  => reader.json(sourceDir)
      case FileType.Parquet => reader.parquet(sourceDir)
      case FileType.Orc     => reader.orc(sourceDir)
      case other            => throw new UnsupportedOperationException(s"streaming load for $other")
    }
    // A previous session's warehouse directory without a catalog entry would
    // fail table creation; clear it ONLY when orphaned (an existing table
    // keeps its data — checkpoint resume appends).
    graft.ops.TableIO.clearOrphanLocation(spark, output)
    val query = df.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .toTable(output.qualifiedName)
    if (await) query.awaitTermination()
    output
  }

  /** Windowed streaming aggregation with a watermark — the stateful-agg shape
    * a training-data ingest pipeline needs (counts per key per event-time
    * window, late data bounded by the watermark).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermark: String,
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(org.apache.spark.sql.functions.col(tsCol), windowDuration),
        org.apache.spark.sql.functions.col(keyCol))
      .agg(count(lit(1)).as("cnt"))
  }
}
