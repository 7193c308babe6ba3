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
