package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series AS-OF join: for each left row attach the most recent right
  * row with `right.ts <= left.ts` within the same key (the classic
  * trades-to-quotes / events-to-last-marker join).
  *
  * Beyond-reference scope: the reference delegates all query execution to
  * the target warehouse and has no time-series operator of its own
  * (`/root/reference/python-sdk/src/astro/sql/__init__.py:20-50` — the
  * public API stops at transform/merge/append); training-data pipelines
  * need this constantly (label joins, last-state attribution).
  *
  * Spark-first design — the naive formulation is an inequality join
  * (`l.key = r.key AND r.ts <= l.ts` + argmax), which Spark executes as a
  * per-key cross product: O(|L| × |R|) within every key. This instead tags
  * both sides, unions them, and takes ONE window pass:
  *
  *   union → shuffle by key (single exchange of |L| + |R| rows)
  *         → sort within partition by (ts, side, tiebreak)
  *         → `last(right_payload, ignoreNulls)` over rows
  *           UNBOUNDED PRECEDING .. CURRENT ROW
  *         → keep left rows
  *
  * Cost at 100 TB: one hash exchange of both inputs + an in-partition sort
  * — no row-count amplification at any point, no per-key driver state, no
  * collect. A pathologically hot key degrades to one partition's sort (the
  * window is order-dependent, so it cannot be salted); everything else
  * scales with partition count.
  *
  * Tie semantics: right rows sort BEFORE left rows at equal ts, so an
  * exactly-simultaneous right row is visible (matches `r.ts <= l.ts`).
  * Among right rows tied on (key, ts), the one with the greatest
  * `rightTieBreak` wins — deterministic across engines and partitionings.
  */
object AsofJoin {

  /** Left-outer as-of join: returns every left row with `rightCols`
    * appended (null when the key has no right row at-or-before `leftTs`).
    *
    * @param on            equality key columns (present in both sides)
    * @param leftTs        left ordering column (numeric or timestamp)
    * @param rightTs       right ordering column (same type as `leftTs`)
    * @param rightCols     right payload columns to attach; must not collide
    *                      with left column names
    * @param rightTieBreak orders right rows tied on (key, ts); greatest wins
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      rightTieBreak: String,
  ): DataFrame = {
    require(on.nonEmpty, "asof join needs at least one equality key")
    val leftCols = left.columns.toSeq.filterNot(on.contains)
    val overlap  = rightCols.intersect(left.columns.toSeq)
    require(overlap.isEmpty, s"right payload columns collide with left: ${overlap.mkString(", ")}")

    val lvType  = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rvType  = right.select(struct(rightCols.map(col): _*)).schema.head.dataType
    val tieType = right.select(col(rightTieBreak)).schema.head.dataType

    val taggedLeft = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        struct(leftCols.map(col): _*).as("__lv"),
        lit(null).cast(rvType).as("__rv"),
      ): _*,
    )
    val taggedRight = right.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        col(rightTieBreak).as("__tie"),
        lit(null).cast(lvType).as("__lv"),
        struct(rightCols.map(col): _*).as("__rv"),
      ): _*,
    )

    // nulls-first __tie keeps left rows (null tie) from outsorting right
    // rows at an equal ts in pathological orderings; among right ties the
    // greatest tiebreak lands nearest the window frame's end.
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(on.map(col) ++ Seq(col("__lv.*"), col("__match.*")).map(identity): _*)
  }
}
