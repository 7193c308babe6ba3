package graft.ops

import graft.model._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** `transform` / `transform_file` / `run_raw_sql` templating
  * (reference: python-sdk/src/astro/sql/operators/transform.py:20-191 and
  * base_decorator.py:240-272).
  *
  * `{{name}}` placeholders resolve to either
  *  - a Table/DataFrame parameter → registered as a temp view, substituted as
  *    a safe identifier (the reference renders qualified names / Snowflake
  *    IDENTIFIER binds, databases/base.py:804-833), or
  *  - a scalar parameter → passed as a Spark named parameter (`:name`), never
  *    string-interpolated — mirrors the reference's SQLAlchemy bind params.
  *
  * The relational work (joins, aggregations, windows, CTEs, set ops) is the
  * rendered SELECT itself, executed by Catalyst — the reference delegates the
  * same way to the target warehouse (SURVEY.md §2 note).
  */
object Templating {

  private val Placeholder = raw"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}".r

  /** Render `{{k}}` placeholders. Table params become validated identifiers;
    * scalar params become `:k` named-parameter references.
    */
  def render(sql: String, tables: Map[String, String], scalars: Set[String]): String =
    Placeholder.replaceAllIn(sql, m => {
      val k = m.group(1)
      if (tables.contains(k)) java.util.regex.Matcher.quoteReplacement(tables(k))
      else if (scalars.contains(k)) ":" + k
      else throw new IllegalArgumentException(s"unbound template parameter: {{$k}}")
    })
}

object Transform {

  /** Run a templated SELECT against Table/DataFrame/scalar params and return
    * the lazy result (reference TransformOperator.execute,
    * transform.py:55-72 — minus the CTAS, see [[toTable]]).
    */
  def run(
      spark: SparkSession,
      sql: String,
      params: Map[String, Any] = Map.empty,
  ): DataFrame = {
    val tableParams = scala.collection.mutable.Map[String, String]()
    val scalarArgs  = scala.collection.mutable.Map[String, Any]()
    params.foreach {
      case (k, t: Table) =>
        tableParams(k) = t.qualifiedName
      case (k, ds: org.apache.spark.sql.Dataset[_]) =>
        val df = ds.toDF()
        // Literal DataFrame args become temp views (the reference first
        // materializes pd.DataFrame args into temp tables,
        // base_decorator.py:369-417 — a view keeps it lazy and distributed).
        val view = Table.temp().name
        df.createOrReplaceTempView(view)
        tableParams(k) = s"`$view`"
      case (k, v) =>
        scalarArgs(k) = v
    }
    val rendered = Templating.render(sql, tableParams.toMap, scalarArgs.keySet.toSet)
    if (scalarArgs.isEmpty) spark.sql(rendered)
    else spark.sql(rendered, scalarArgs.toMap)
  }

  /** CTAS: render + execute + materialize as a catalog table (reference
    * drop-then-`CREATE TABLE AS` at databases/base.py:363-381 — rerunnable,
    * hence the idempotency-safe write).
    */
  def toTable(
      spark: SparkSession,
      sql: String,
      output: Table,
      params: Map[String, Any] = Map.empty,
  ): Table =
    TableIO.overwrite(spark, run(spark, sql, params), output)

  /** `transform_file`: SQL text read from a .sql file
    * (reference: transform.py:145-191).
    */
  def fromFile(
      spark: SparkSession,
      sqlPath: String,
      output: Table,
      params: Map[String, Any] = Map.empty,
  ): Table = {
    val sql = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(sqlPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    toTable(spark, sql, output, params)
  }
}
