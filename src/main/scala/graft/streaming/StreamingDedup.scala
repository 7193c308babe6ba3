package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.IncrementalDedup
import graft.model.Table
import graft.ops.TableIO

/** Dedup-on-ingest: a streaming source drains into a target table with each
  * micro-batch exact-deduplicated against the persisted fingerprint store
  * ([[IncrementalDedup]]) — so the target only ever accumulates
  * first-seen documents, across batches AND across restarts (the store is
  * a plain catalog table, not in-memory stream state).
  *
  * Why not `dropDuplicates` + watermark on the stream itself: Spark's
  * streaming dedup state lives in the state store and must be bounded by a
  * watermark — corpus-lifetime dedup state (every fingerprint ever seen)
  * does not fit that model, but it is exactly what the at-rest fingerprint
  * store IS. `foreachBatch` bridges the two: per micro-batch, the store
  * streams once with the batch broadcast (see [[IncrementalDedup]] scale
  * notes), survivors append to both target and store.
  *
  * Exactly-once caveat, stated honestly: `foreachBatch` is at-least-once
  * on retry. A replayed micro-batch re-checks against the store, and
  * because its earlier survivors are already IN the store, re-appending is
  * suppressed — the store turns replays into no-ops (dedup is itself the
  * idempotence mechanism), except for a replay that dies between the
  * target append and the store append (the two writes are not one
  * transaction). Appending to the STORE first narrows the window to
  * "crash between store and target append ⇒ those docs are dropped, not
  * doubled" — for dedup the safe direction.
  */
object StreamingDedup {

  /** Start draining `stream` into `target` with per-batch incremental exact
    * dedup against `store` (created from the existing target content — or
    * empty — if absent). For `Trigger.AvailableNow` + `await`, blocks until
    * the backlog is consumed.
    */
  def exactIncrementalSink(
      spark: SparkSession,
      stream: DataFrame,
      textCol: String,
      idCol: String,
      target: Table,
      store: Table,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      await: Boolean = true,
  ): StreamingQuery = {
    if (!spark.catalog.tableExists(store.qualifiedName)) {
      val seed =
        if (spark.catalog.tableExists(target.qualifiedName)) spark.table(target.qualifiedName)
        else stream.sparkSession.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stream.schema)
      IncrementalDedup.buildFingerprintStore(spark, seed, textCol, store)
    }
    TableIO.clearOrphanLocation(spark, target)
    val query = stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // store append happens INSIDE dedupExactIncremental before we
        // append the (checkpoint-pinned) survivors to the target: a retry
        // that replays this batch finds its fingerprints present and emits
        // nothing — no doubled docs in the target.
        val survivors = IncrementalDedup.dedupExactIncremental(
          spark, batch, textCol, idCol, store)
        if (!spark.catalog.tableExists(target.qualifiedName))
          TableIO.overwrite(spark, survivors, target)
        else
          survivors.write.mode("append").saveAsTable(target.qualifiedName)
        // `survivors` rides the micro-batch's CLONED session; its append
        // invalidates only that clone's relation cache — refresh the outer
        // session so readers see the appended files, not a stale listing.
        spark.catalog.refreshTable(target.qualifiedName)
        ()
      }
      .start()
    if (await) query.awaitTermination()
    query
  }
}
