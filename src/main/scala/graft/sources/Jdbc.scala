package graft.sources

import java.util.Properties

import graft.model.{IfExists, Table}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — external-database parity for the reference's nine DB
  * backends (SURVEY.md §2 sinks matrix: "optional JDBC writer for
  * external-DB parity"; reference per-DB loaders e.g.
  * python-sdk/src/astro/databases/base.py:639-664 `to_sql`, postgres.py
  * COPY, snowflake.py write_pandas — all collapse into Spark's JDBC
  * relation).
  *
  * Scale notes:
  *  - READS partition by a numeric/date column (`readPartitioned`) so all
  *    executors pull concurrently — an unpartitioned JDBC read is a single
  *    connection funnel; at warehouse scale always give the partition spec.
  *  - Filters and column pruning push into the remote SQL (verified:
  *    `PushedFilters` on the JDBCRelation scan node).
  *  - WRITES open one connection per partition; `batchsize` controls
  *    rows-per-roundtrip. Repartition the frame to the DB's comfortable
  *    concurrency before writing (a 1000-partition write = 1000 concurrent
  *    connections — size it deliberately).
  */
object Jdbc {

  private def props(options: Map[String, String]): Properties = {
    val p = new Properties()
    options.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Whole-table (or `(SELECT …) alias` subquery) read — single stream;
    * prefer [[readPartitioned]] for big tables.
    */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, table, props(options))

  /** Executor-parallel read: `numPartitions` range predicates over
    * `partitionCol` ∈ [lower, upper].
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      lower: Long,
      upper: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty,
  ): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props(options))

  /** Write with the load_file `ifExists` contract (replace → overwrite,
    * append → append, exception → error-if-exists).
    */
  def write(
      spark: SparkSession,
      df: DataFrame,
      url: String,
      table: String,
      ifExists: IfExists = IfExists.Replace,
      options: Map[String, String] = Map.empty,
  ): Unit = {
    val mode = ifExists match {
      case IfExists.Replace   => SaveMode.Overwrite
      case IfExists.Append    => SaveMode.Append
      case IfExists.Exception => SaveMode.ErrorIfExists
    }
    df.write.mode(mode).jdbc(url, table, props(options))
  }

  /** Import a remote table into the Spark catalog (the reference's
    * "load into warehouse" direction).
    */
  def importTable(
      spark: SparkSession,
      url: String,
      remoteTable: String,
      target: Table,
      options: Map[String, String] = Map.empty,
  ): Table =
    graft.ops.TableIO.overwrite(spark, read(spark, url, remoteTable, options), target)
}
