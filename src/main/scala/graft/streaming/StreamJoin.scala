package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Stream-stream equi-join with an event-time range constraint — the
  * enrichment shape of a training-data ingest pipeline (e.g. attach the
  * preceding click to each purchase while both feeds are still streaming).
  *
  * Spark-first: this is Structured Streaming's native interval join — an
  * equi-join key plus a time-range predicate. The range bound is what makes
  * it scale: with watermarks on both sides, each side's join state is
  * evicted once the other side's watermark passes `ts + maxLag`, so state
  * size is O(rows within the lag window per key), not O(stream history).
  *
  * Column names must already be disambiguated by the caller (no shared
  * names between the two sides) — the same contract as Spark's own
  * stream-stream join examples.
  */
object StreamJoin {

  /** Inner-join `left` and `right` on `leftKey = rightKey` where
    * `rightTs ∈ [leftTs − maxLagSeconds, leftTs]` (both bounds inclusive).
    *
    * For inner joins the output is complete regardless of watermark pace —
    * a match emits in the micro-batch where its later row arrives; the
    * watermark only bounds state retention. Outer variants would emit
    * null-extended rows on watermark passage (same API, `joinType` param).
    */
  def intervalJoin(
      left: DataFrame,
      leftKey: String,
      leftTs: String,
      right: DataFrame,
      rightKey: String,
      rightTs: String,
      maxLagSeconds: Long,
      watermarkDelay: String,
      joinType: String = "inner",
  ): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    // Column API, not an expr() string splice: caller-supplied names needing
    // backticks (dots, spaces, hyphens) would fail to parse — or worse, parse
    // as expressions. Only the literal interval goes through expr().
    val lag = expr(s"interval $maxLagSeconds seconds")
    l.join(
      r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - lag &&
        col(rightTs) <= col(leftTs),
      joinType,
    )
  }
}
