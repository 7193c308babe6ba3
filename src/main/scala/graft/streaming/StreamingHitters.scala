package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Table
import graft.ops.{HeavyHitters, TableIO}

/** Streaming heavy hitters: drain a text stream into the incremental
  * Misra–Gries hitter store ([[graft.ops.HeavyHitters]]) — the "what's
  * trending in the ingest feed" report maintained as data arrives, the
  * streaming sibling of [[StreamingSample]]'s reservoir sink.
  *
  * Per micro-batch: one sketch pass over the BATCH's tokens (distributed,
  * map-side combined) plus an O(capacity) driver-side summary fold —
  * never a historical rescan, so cost is independent of how much corpus
  * the stream has already delivered. A later
  * `HeavyHitters.topKTermsFromStore` recount is provably exact against
  * the accumulated corpus via the same coverage assert as the batch path.
  *
  * Replay semantics (foreachBatch is at-least-once): an MG summary fold
  * is additive, so a replayed batch double-counts its tokens IN THE
  * SUMMARY. That cannot create a false positive (the exact recount scores
  * candidates against the real corpus), cannot evict a true heavy hitter
  * (extra mass only widens the surviving candidates' margin), and only
  * inflates the stored total — making the coverage assert strictly MORE
  * conservative. The store stays a safe lower-bound sketch under replay.
  *
  * Crash-mid-fold semantics: the store persists via `TableIO.publish`
  * (generation write + atomic view flip), so a crash at ANY point in a
  * fold — including mid-write — leaves the previous generation's complete
  * summary live; the recovered stream re-runs the batch and the additive
  * analysis above applies. (A plain overwrite would open a drop-then-
  * rewrite window that could lose the whole accumulated summary and
  * silently understate the coverage total.) Both failure modes are
  * injection-tested in `StreamingFailureSpec`.
  */
object StreamingHitters {

  /** Start folding `stream` into `store` (created on the first batch).
    * For `Trigger.AvailableNow` + `await`, blocks until the backlog is
    * consumed.
    */
  def hitterStoreSink(
      spark: SparkSession,
      stream: DataFrame,
      textCol: String,
      capacity: Int,
      store: Table,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      await: Boolean = true,
  ): StreamingQuery = {
    TableIO.clearOrphanLocation(spark, store)
    val query = stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        HeavyHitters.foldBatchIntoStore(spark, batch, textCol, store, capacity)
        ()
      }
      .start()
    if (await) query.awaitTermination()
    query
  }
}
