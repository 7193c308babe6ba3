package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.{Dedup, IncrementalDedup}
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

  /** Start draining `stream` into `target` with per-batch NEAR dedup:
    * batch-internal near-dups collapse first ([[Dedup.dedupNear]]), then the
    * remainder checks against the persisted LSH band index
    * ([[IncrementalDedup.dedupNearIncremental]]) of everything admitted so
    * far; survivors append to target and their bands to the index.
    *
    * Retry semantics (foreachBatch is at-least-once): the index appends
    * BEFORE the target append. A replay whose first attempt fully landed is
    * suppressed by self-similarity (the doc verifies J=1.0 against its own
    * corpus row). A replay whose first attempt died between index and
    * target append re-admits the doc: its stale index rows point at ids
    * absent from the corpus, so the exact-Jaccard verify — which re-reads
    * shingles from the CORPUS, not the index — finds no row and clears it.
    * Stale band rows are harmless (they can only create candidates that
    * verification then drops) — so the near sink converges to
    * exactly-once TARGET contents under crash-replay, with only dead index
    * rows as residue. Banding dial: same trade as
    * [[Dedup.recallExactBands]]; r=4 at production thresholds.
    */
  def nearIncrementalSink(
      spark: SparkSession,
      stream: DataFrame,
      textCol: String,
      idCol: String,
      target: Table,
      index: Table,
      checkpointDir: String,
      threshold: Double = 0.7,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleK: Int = 3,
      trigger: Trigger = Trigger.AvailableNow(),
      await: Boolean = true,
  ): StreamingQuery = {
    if (!spark.catalog.tableExists(index.qualifiedName)) {
      val seed =
        if (spark.catalog.tableExists(target.qualifiedName)) spark.table(target.qualifiedName)
        else stream.sparkSession.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stream.schema)
      IncrementalDedup.buildLshIndex(spark, seed, idCol, textCol, index,
        numHashes = numHashes, bands = bands, shingleK = shingleK)
    }
    TableIO.clearOrphanLocation(spark, target)
    val query = stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val withinBatch = Dedup.dedupNear(batch, idCol, textCol, threshold, bands)
        val corpus =
          if (spark.catalog.tableExists(target.qualifiedName)) spark.table(target.qualifiedName)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
        val survivors = IncrementalDedup.dedupNearIncremental(
          spark, withinBatch, corpus, idCol, textCol, index,
          threshold, numHashes, bands, shingleK)
        if (!spark.catalog.tableExists(target.qualifiedName))
          TableIO.overwrite(spark, survivors, target)
        else
          survivors.write.mode("append").saveAsTable(target.qualifiedName)
        // cloned-session cache invalidation doesn't reach `spark` — refresh
        // so the next micro-batch's corpus read lists the appended files
        spark.catalog.refreshTable(target.qualifiedName)
        ()
      }
      .start()
    if (await) query.awaitTermination()
    query
  }

  /** Curated ingest: per micro-batch, drop docs contaminated against the
    * persisted eval-gram store ([[IncrementalDedup.contaminatedIncremental]]
    * — the store must exist; eval sets are curated out of band), then
    * exact-dedup the remainder against the fingerprint store, then append.
    * The composition inherits [[exactIncrementalSink]]'s replay story
    * verbatim: decontamination is a pure read (replay-safe by itself), and
    * the fingerprint store turns replayed appends into no-ops — so the
    * quality gate does not weaken the idempotence mechanism.
    */
  def curatedIngestSink(
      spark: SparkSession,
      stream: DataFrame,
      textCol: String,
      idCol: String,
      target: Table,
      fpStore: Table,
      gramStore: Table,
      checkpointDir: String,
      gramK: Int = 8,
      trigger: Trigger = Trigger.AvailableNow(),
      await: Boolean = true,
  ): StreamingQuery = {
    require(spark.catalog.tableExists(gramStore.qualifiedName),
      s"eval gram store ${gramStore.qualifiedName} must be built first " +
        "(IncrementalDedup.buildGramStore)")
    if (!spark.catalog.tableExists(fpStore.qualifiedName)) {
      val seed =
        if (spark.catalog.tableExists(target.qualifiedName)) spark.table(target.qualifiedName)
        else stream.sparkSession.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stream.schema)
      IncrementalDedup.buildFingerprintStore(spark, seed, textCol, fpStore)
    }
    TableIO.clearOrphanLocation(spark, target)
    val query = stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hits = IncrementalDedup.contaminatedIncremental(
          spark, batch, idCol, textCol, gramStore, gramK)
        val clean = batch.join(
          org.apache.spark.sql.functions.broadcast(hits), Seq(idCol), "left_anti")
        val survivors = IncrementalDedup.dedupExactIncremental(
          spark, clean, textCol, idCol, fpStore)
        if (!spark.catalog.tableExists(target.qualifiedName))
          TableIO.overwrite(spark, survivors, target)
        else
          survivors.write.mode("append").saveAsTable(target.qualifiedName)
        spark.catalog.refreshTable(target.qualifiedName)
        ()
      }
      .start()
    if (await) query.awaitTermination()
    query
  }
}
