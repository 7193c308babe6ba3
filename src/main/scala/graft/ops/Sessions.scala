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
