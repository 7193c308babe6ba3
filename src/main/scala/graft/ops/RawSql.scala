package graft.ops

import graft.model.Table
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** `run_raw_sql` / `get_value_list` / row-count-style helpers
  * (reference: python-sdk/src/astro/sql/operators/raw_sql.py:25-234,
  * sql/__init__.py:53-79, databases/base.py:835-846).
  */
object RawSql {

  /** Result shape knob (reference RunRawSQLResultFormat, constants.py:95). */
  sealed trait ResultsFormat
  object ResultsFormat {
    /** `.collect()`-ed rows — bounded by `responseSize` */
    case object RowList extends ResultsFormat
    /** the lazy distributed DataFrame (replaces `pandas_dataframe`) */
    case object Frame extends ResultsFormat
  }

  /** Execute arbitrary SQL (DDL/DML/SELECT) with templating. A SELECT is
    * returned per `resultsFormat`; `responseSize >= 0` caps collected rows
    * (reference response_size guard, raw_sql.py:118-146 — never an unbounded
    * collect). `failOnEmpty` mirrors raw_sql.py:96.
    */
  def run(
      spark: SparkSession,
      sql: String,
      params: Map[String, Any] = Map.empty,
      resultsFormat: ResultsFormat = ResultsFormat.Frame,
      responseSize: Int = -1,
      failOnEmpty: Boolean = false,
  ): Either[Seq[Row], DataFrame] = {
    val df      = Transform.run(spark, sql, params)
    val limited = if (responseSize >= 0) df.limit(responseSize) else df
    if (failOnEmpty && limited.isEmpty)
      throw new IllegalStateException("run_raw_sql returned no rows and fail_on_empty=true")
    resultsFormat match {
      case ResultsFormat.RowList => Left(limited.collect().toSeq)
      case ResultsFormat.Frame   => Right(limited)
    }
  }

  /** `get_value_list`: run SQL, return rows capped at `maxLength` for dynamic
    * fan-out (reference: sql/__init__.py:53-79).
    */
  def getValueList(spark: SparkSession, sql: String, maxLength: Int = 1000): Seq[Row] =
    Transform.run(spark, sql).limit(maxLength).collect().toSeq

  // --- Table helpers (reference databases/base.py:835-846, 446-459, 174-196) ---

  def rowCount(spark: SparkSession, table: Table): Long =
    spark.table(table.qualifiedName).count()

  def fetchAllRows(spark: SparkSession, table: Table, rowLimit: Int = -1): Seq[Row] = {
    val df = spark.table(table.qualifiedName)
    (if (rowLimit >= 0) df.limit(rowLimit) else df).collect().toSeq
  }

  def tableExists(spark: SparkSession, table: Table): Boolean =
    spark.catalog.tableExists(table.qualifiedName)

  def schemaExists(spark: SparkSession, database: String): Boolean =
    spark.catalog.databaseExists(database)

  def columnsExist(spark: SparkSession, table: Table, columns: Seq[String]): Boolean = {
    val have = spark.table(table.qualifiedName).columns.map(_.toLowerCase).toSet
    columns.forall(c => have.contains(c.toLowerCase))
  }
}

/** `query_modifier`: session-setup SQL run before/after the main statement
  * (reference: python-sdk/src/astro/query_modifier.py:7-29, applied at
  * databases/base.py:162-168). In Spark these are typically `SET` commands.
  */
final case class QueryModifier(preQueries: Seq[String] = Nil, postQueries: Seq[String] = Nil) {
  def runWith[A](spark: SparkSession)(body: => A): A = {
    preQueries.foreach(spark.sql(_).collect())
    try body
    finally postQueries.foreach(spark.sql(_).collect())
  }
}
