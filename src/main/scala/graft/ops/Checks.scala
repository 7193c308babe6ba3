package graft.ops

import graft.model.Table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality checks (reference:
  * python-sdk/src/astro/sql/operators/data_validations/check_column.py:13-210
  * and check_table.py:12-109).
  *
  * All per-column checks for all columns run as ONE aggregate pass over the
  * data — never one scan per check (the reference delegates to a single
  * SQLColumnCheckOperator query the same way). At 100 TB, per-check scans are
  * the difference between one job and dozens.
  */
object Checks {

  /** Bound spec: any subset of the reference's comparison keys
    * (check_column.py: equal_to / greater_than / less_than / geq_to / leq_to,
    * each honoring ± tolerance as a relative fraction).
    */
  final case class Bound(
      equalTo: Option[Double] = None,
      greaterThan: Option[Double] = None,
      lessThan: Option[Double] = None,
      geqTo: Option[Double] = None,
      leqTo: Option[Double] = None,
      tolerance: Double = 0.0,
  ) {
    def passes(value: Double): Boolean = {
      def tol(x: Double) = math.abs(x) * tolerance
      equalTo.forall(e => value >= e - tol(e) && value <= e + tol(e)) &&
      greaterThan.forall(b => value > b - tol(b)) &&
      lessThan.forall(b => value < b + tol(b)) &&
      geqTo.forall(b => value >= b - tol(b)) &&
      leqTo.forall(b => value <= b + tol(b))
    }
  }

  final case class CheckResult(column: String, check: String, value: Double, passed: Boolean)

  /** The reference's check vocabulary (check_column.py:106-112):
    * null_check = #nulls, distinct_check = #distinct, unique_check =
    * #rows − #distinct, min, max.
    */
  private def aggFor(column: String, check: String): Column = check match {
    case "null_check"     => sum(when(col(column).isNull, 1L).otherwise(0L)).cast("double")
    case "distinct_check" => count_distinct(col(column)).cast("double")
    case "unique_check"   => (count(col(column)) - count_distinct(col(column))).cast("double")
    case "min"            => min(col(column)).cast("double")
    case "max"            => max(col(column)).cast("double")
    case other            => throw new IllegalArgumentException(s"unknown column check: $other")
  }

  /** `check_column`: run every (column, check, bound) in one aggregate job.
    * `partitionClause` mirrors the reference's WHERE pre-filter.
    */
  def checkColumn(
      df: DataFrame,
      mapping: Map[String, Map[String, Bound]],
      partitionClause: Option[String] = None,
  ): Seq[CheckResult] = {
    require(mapping.nonEmpty, "check_column requires at least one check")
    val filtered = partitionClause.fold(df)(df.where)
    val triples = mapping.toSeq.sortBy(_._1).flatMap { case (c, checks) =>
      checks.toSeq.sortBy(_._1).map { case (name, bound) => (c, name, bound) }
    }
    val aggs = triples.zipWithIndex.map { case ((c, name, _), i) => aggFor(c, name).as(s"v$i") }
    val row  = filtered.agg(aggs.head, aggs.tail: _*).collect()(0)
    triples.zipWithIndex.map { case ((c, name, bound), i) =>
      val v = if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
      CheckResult(c, name, v, !v.isNaN && bound.passes(v))
    }
  }

  /** Throwing variant — the operator contract (task fails on check failure). */
  def requireColumnChecks(
      df: DataFrame,
      mapping: Map[String, Map[String, Bound]],
      partitionClause: Option[String] = None,
  ): Seq[CheckResult] = {
    val results = checkColumn(df, mapping, partitionClause)
    val failed  = results.filterNot(_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(s"column checks failed: ${failed.mkString("; ")}")
    results
  }

  /** `check_table`: named boolean SQL checks (reference check_table.py:55-60).
    * Row-level statements (`col_a + col_b < col_c`) must hold for EVERY row →
    * `every(expr)`; aggregate statements (`count(*) = 1000`) pass through.
    * All checks run in one aggregate pass.
    */
  def checkTable(
      df: DataFrame,
      checks: Map[String, String],
      partitionClause: Option[String] = None,
  ): Map[String, Boolean] = {
    require(checks.nonEmpty, "check_table requires at least one check")
    val filtered = partitionClause.fold(df)(df.where)
    val names    = checks.keys.toSeq.sorted
    val aggs = names.map { n =>
      val stmt    = expr(checks(n)).cast("boolean")
      val rowWise = coalesce(every(stmt), lit(true)).as(n)
      // Aggregate statements can't be every()-wrapped; detect via analysis
      // (cheap — no job runs) and pass them through bare.
      try { filtered.agg(rowWise).queryExecution.analyzed; rowWise }
      catch { case _: org.apache.spark.sql.AnalysisException => stmt.as(n) }
    }
    val row = filtered.agg(aggs.head, aggs.tail: _*).collect()(0)
    names.zipWithIndex.map { case (n, i) => n -> row.getBoolean(i) }.toMap
  }

  def requireTableChecks(
      df: DataFrame,
      checks: Map[String, String],
      partitionClause: Option[String] = None,
  ): Map[String, Boolean] = {
    val results = checkTable(df, checks, partitionClause)
    val failed  = results.collect { case (n, false) => n }
    if (failed.nonEmpty)
      throw new IllegalStateException(s"table checks failed: ${failed.mkString(", ")}")
    results
  }

  def checkTable(
      spark: SparkSession,
      table: Table,
      checks: Map[String, String],
  ): Map[String, Boolean] = checkTable(spark.table(table.qualifiedName), checks)
}
