package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BATCH sessionization — the at-rest twin of the streaming
  * [[graft.streaming.Sessionize]] (same gap rule: an event extends the
  * current session while its gap to the session end is < `gapSeconds`).
  * Use this for backfills and historical re-sessionization, the streaming
  * op for live ingest; on the same events both produce identical sessions
  * (shared oracle — q32/q145).
  *
  * Scale shape: one shuffle by key; the lag/cumsum windows are
  * partition-local per key (bounded by a user's OWN event history, never
  * the corpus). No state store, no watermark — the batch advantage.
  */
object Sessions {

  /** Ordered funnel analysis: how far each key progressed through `steps`
    * (step i counts only at or after the completion time of step i−1 —
    * "first view, then the first click AFTER that view, …"). Output:
    * `(keyCol, steps_completed)` with 0 for keys that never hit step 0.
    *
    * Scale shape: one `min` aggregate + key join per step — k small
    * bounded rounds; events shuffle by key, the accumulating per-key frame
    * is one row per key. (A per-key sorted state machine would do it in
    * one pass but buys nothing at k ≈ 3–5.)
    */
  def funnel(
      df: DataFrame,
      keyCol: String,
      typeCol: String,
      secCol: String,
      steps: Seq[String],
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc: DataFrame = df.select(col(keyCol)).distinct()
    var prev: Option[String] = None
    steps.zipWithIndex.foreach { case (st, i) =>
      val tcol = s"__t$i"
      val stepTimes = prev match {
        case None =>
          df.where(col(typeCol) === st).groupBy(col(keyCol)).agg(min(col(secCol)).as(tcol))
        case Some(p) =>
          df.where(col(typeCol) === st)
            .join(acc.select(col(keyCol), col(p)).where(col(p).isNotNull), Seq(keyCol))
            .where(col(secCol) >= col(p))
            .groupBy(col(keyCol)).agg(min(col(secCol)).as(tcol))
      }
      acc = acc.join(stepTimes, Seq(keyCol), "left")
      prev = Some(tcol)
    }
    // build innermost-first so the HIGHEST completed step wins:
    // when(tN, N+1).otherwise(... when(t0, 1).otherwise(0))
    val completed = steps.indices.foldLeft(lit(0L)) { (rest, i) =>
      when(col(s"__t$i").isNotNull, lit((i + 1).toLong)).otherwise(rest)
    }
    acc.select(col(keyCol), completed.as("steps_completed"))
  }

  /** Cohort retention: keys grouped by the period of their FIRST
    * `anchorType` event (the cohort), counting distinct cohort members
    * active again `offset` periods later —
    * `(cohort, period_offset, active_keys)`.
    *
    * Scale shape: the (key, period) activity set dedups BEFORE the cohort
    * join (volume = active key-periods, not events); the cohort table is
    * one row per key. Integer period math throughout (engine-portable).
    */
  def cohortRetention(
      df: DataFrame,
      keyCol: String,
      typeCol: String,
      secCol: String,
      anchorType: String,
      periodSeconds: Long = 604800L,
      maxOffset: Int = 8,
  ): DataFrame = {
    require(periodSeconds > 0 && maxOffset >= 0, "bad period/offset")
    val cohorts = df.where(col(typeCol) === anchorType)
      .groupBy(col(keyCol))
      .agg(min(expr(s"$secCol div ${periodSeconds}L")).as("cohort"))
    val active = df.select(col(keyCol), expr(s"$secCol div ${periodSeconds}L").as("p")).distinct()
    cohorts.join(active, Seq(keyCol))
      .select(col("cohort"), (col("p") - col("cohort")).as("period_offset"), col(keyCol))
      .where(col("period_offset").between(0, maxOffset))
      .groupBy(col("cohort"), col("period_offset"))
      .agg(countDistinct(col(keyCol)).as("active_keys"))
  }

  /** `(keyCol, session_start, session_end, events)` — `secCol` is epoch
    * seconds (use [[graft.SparkEntry]]-style schema-adaptive extraction for
    * timestamp columns).
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      secCol: String,
      gapSeconds: Long,
  ): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val w   = Window.partitionBy(col(keyCol)).orderBy(col(secCol))
    val brk = when(
      lag(col(secCol), 1).over(w).isNull ||
        col(secCol) - lag(col(secCol), 1).over(w) >= gapSeconds, 1L).otherwise(0L)
    val sid = sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.select(col(keyCol), col(secCol).as("__sec"), sid.as("__sid"))
      .groupBy(col(keyCol), col("__sid"))
      .agg(
        min(col("__sec")).cast("long").as("session_start"),
        max(col("__sec")).cast("long").as("session_end"),
        count(lit(1)).as("events"))
      .select(col(keyCol), col("session_start"), col("session_end"), col("events"))
  }
}
