package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column row/null/distinct counts and numeric
  * min/max/sum, unpivoted to one row per column — the "what is in this
  * table" report that precedes every curation decision, and the natural
  * extension of the reference's column checks
  * (python-sdk/src/astro/sql/operators/data_validations/check_column.py)
  * from asserting known expectations to DISCOVERING them.
  *
  * One distributed pass over the data: all aggregates go into a single
  * `agg(...)`; the exact distinct counts make Catalyst plan an Expand
  * (input ×(cols+1) before the partial aggregate), which is the honest
  * price of EXACT distincts. At 100 TB swap `countDistinct` for
  * `approx_count_distinct` (same plan shape minus the Expand) — exposed via
  * `exact = false`. The unpivot is a `stack` over the single aggregated
  * row: driver-sized, free.
  */
object Profile {

  def numeric(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__dc"),
        min(col(c).cast("double")).as(s"${c}__mn"),
        max(col(c).cast("double")).as(s"${c}__mx"),
        round(sum(col(c).cast("double")), 2).as(s"${c}__sm"),
      )
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __rows, `${c}__nn`, __rows - `${c}__nn`, `${c}__dc`, `${c}__mn`, `${c}__mx`, `${c}__sm`"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, row_cnt, non_null_cnt, null_cnt, distinct_cnt, min_val, max_val, sum_val)"))
  }

  /** Fixed-width histogram of a numeric column: `(bin, lo, hi, n)` with
    * out-of-range values clamped into the edge bins — the distribution
    * report behind bound-picking (mixture budgets, drift thresholds,
    * z-order bounds). One partial-agg shuffle over ≤`bins` keys.
    */
  def histogram(
      df: DataFrame,
      colName: String,
      min: Double,
      max: Double,
      bins: Int,
  ): DataFrame = {
    require(max > min && bins >= 1, "need max > min and bins >= 1")
    val width = (max - min) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(colName).cast("double") - min) * bins / (max - min)).cast("int")))
    df.where(col(colName).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        round(lit(min) + col("bin") * width, 4).as("lo"),
        round(lit(min) + (col("bin") + 1) * width, 4).as("hi"),
        col("n"))
  }

  /** Profile DRIFT gate between two snapshots — the automated promotion
    * check on corpus v(N+1): per (column, metric) the before/after values,
    * the relative change, and a within-threshold verdict. Metrics:
    * `row_cnt`, `null_frac`, `distinct_cnt`, `mean`. One profiling pass
    * per side (everything downstream is driver-sized arithmetic on the
    * two one-row-per-column profiles).
    */
  def drift(
      before: DataFrame,
      after: DataFrame,
      cols: Seq[String],
      maxRelChange: Double = 0.05,
      exact: Boolean = true,
  ): DataFrame = {
    def metrics(df: DataFrame, tag: String): DataFrame =
      numeric(df, cols, exact).select(
        col("column_name"),
        col("row_cnt").cast("double").as(s"${tag}_row_cnt"),
        when(col("row_cnt") === 0, 0.0)
          .otherwise(col("null_cnt").cast("double") / col("row_cnt")).as(s"${tag}_null_frac"),
        col("distinct_cnt").cast("double").as(s"${tag}_distinct_cnt"),
        when(col("non_null_cnt") === 0, 0.0)
          .otherwise(col("sum_val") / col("non_null_cnt")).as(s"${tag}_mean"),
      )
    val joined = metrics(before, "b").join(metrics(after, "a"), Seq("column_name"))
    val stacked = joined.select(col("column_name"), expr(
      "stack(4, " +
        "'row_cnt', b_row_cnt, a_row_cnt, " +
        "'null_frac', b_null_frac, a_null_frac, " +
        "'distinct_cnt', b_distinct_cnt, a_distinct_cnt, " +
        "'mean', b_mean, a_mean) AS (metric, before_val, after_val)"))
    stacked.select(
      col("column_name"), col("metric"),
      round(col("before_val"), 4).as("before_val"),
      round(col("after_val"), 4).as("after_val"),
      round(
        abs(col("after_val") - col("before_val")) /
          greatest(abs(col("before_val")), lit(1e-12)), 4).as("rel_change"),
      (abs(col("after_val") - col("before_val")) /
        greatest(abs(col("before_val")), lit(1e-12)) <= maxRelChange).as("ok"),
    )
  }

  /** Snapshot diff between two corpus versions keyed by `idCol` — the
    * regression report run before promoting corpus v(N+1): how many docs
    * were `added` / `removed` / `changed` / `unchanged`, where `changed`
    * means same id but a different content fingerprint
    * ([[graft.functions.TextFunctions.fingerprint]] — normalization-stable
    * md5, so whitespace/case-only edits don't count as changes).
    *
    * Scale shape: both sides reduce to `(id, 16-byte fingerprint)`
    * projections before the one full-outer join on id — document payloads
    * never shuffle; output is a 4-row report.
    */
  def diff(a: DataFrame, b: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fa = a.select(col(idCol).as("id"),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("__fa"))
    val fb = b.select(col(idCol).as("id"),
      graft.functions.TextFunctions.fingerprint(col(textCol)).as("__fb"))
    fa.join(fb, Seq("id"), "full_outer")
      .select(
        when(col("__fa").isNull, "added")
          .when(col("__fb").isNull, "removed")
          .when(col("__fa") =!= col("__fb"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
  }
}
