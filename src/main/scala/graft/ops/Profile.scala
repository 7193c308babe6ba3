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
}
