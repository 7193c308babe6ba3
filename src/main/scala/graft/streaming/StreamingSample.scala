package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, countDistinct}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Table
import graft.ops.{Sampling, TableIO}

/** Streaming weighted reservoir: maintain an exact-n Efraimidis–Spirakis
  * A-ES sample of an ever-growing corpus as it streams in (builder's brief,
  * beyond-reference scope — the "hold out a weight-proportional eval slice
  * while data keeps arriving" primitive of a continuously-ingesting
  * curation pipeline).
  *
  * Why this is exactly correct, not approximately: A-ES ranks every row by
  * u^(1/w) with u a pure function of the row's key (md5-derived — see
  * [[graft.ops.Sampling.weightedSample]]), and top-n-by-rank is
  * MERGE-CLOSED: top_n(A ∪ B) = top_n(top_n(A) ∪ top_n(B)). So a reservoir
  * that keeps the running top-n and folds in each micro-batch's top-n ends
  * at EXACTLY the sample a single batch pass over the full corpus would
  * draw — independent of batch boundaries, arrival order, partitioning, or
  * restarts. That makes the streaming result oracle-checkable against the
  * plain batch SQL (q175 hash-matches q160's oracle shape).
  *
  * Scale shape (100 TB): each micro-batch pays one distributed TakeOrdered
  * (per-partition top-n, driver merges n·partitions candidates — no full
  * sort, no single-partition window); the merge step unions n reservoir
  * rows with n candidates and re-takes top-n — O(n), constant in corpus
  * size. The reservoir itself is a bounded n-row catalog table, not stream
  * state: corpus-lifetime sample state outlives any watermark, so (exactly
  * like [[StreamingDedup]]) it belongs in an at-rest table bridged via
  * `foreachBatch`, not in the state store.
  *
  * Restart/replay semantics: `foreachBatch` is at-least-once on retry. A
  * replayed micro-batch re-derives the SAME top-n candidates (ranks are
  * content-derived, no RNG) and the merge deduplicates identical
  * (key, weight) rows before re-ranking, so replays are no-ops — the
  * determinism is itself the idempotence mechanism. That argument requires
  * the weight to be a PURE FUNCTION OF THE KEY: a key re-emitted with a
  * changed weight would put two differently-ranked rows in contention for
  * slots, so the merge detects weight conflicts in its O(n) pool and fails
  * fast (see `mergeBatch`) rather than silently keeping either row.
  * Crash-mid-fold and replay-after-crash are failure-injected in
  * `StreamingFailureSpec`. The reservoir flip is `TableIO.publish`
  * (generation write + atomic view flip): the merged plan reads the OLD
  * generation's files while the NEW generation writes, and concurrent
  * readers of the reservoir name never observe a partial or missing
  * reservoir.
  */
object StreamingSample {

  /** Start draining `stream` into a bounded weighted reservoir of exactly
    * `n` rows (fewer only while the corpus itself holds fewer eligible
    * rows). The reservoir table stores `(keyCol, weightCol)` — join back on
    * the key for payload, as with any sampler. For `Trigger.AvailableNow` +
    * `await`, blocks until the backlog is consumed.
    */
  def weightedReservoirSink(
      spark: SparkSession,
      stream: DataFrame,
      keyCol: String,
      weightCol: String,
      n: Int,
      reservoir: Table,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      await: Boolean = true,
  ): StreamingQuery = {
    require(n >= 1, "n must be >= 1")
    TableIO.clearOrphanLocation(spark, reservoir)
    val query = stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(spark, batch, keyCol, weightCol, n, reservoir)
        ()
      }
      .start()
    if (await) query.awaitTermination()
    query
  }

  /** One reservoir fold: top-n of (current reservoir ∪ batch top-n).
    * Exposed for the batch-incremental caller (same merge law) and the
    * merge-closure spec.
    */
  private[graft] def mergeBatch(
      spark: SparkSession,
      batch: DataFrame,
      keyCol: String,
      weightCol: String,
      n: Int,
      reservoir: Table,
  ): Unit = {
    val candidates = Sampling.weightedSample(
      batch.select(batch(keyCol), batch(weightCol)), keyCol, weightCol, n)
    // ONE batch scan per fold: the TakeOrdered already merges its n-row
    // result on the driver, so collecting it here costs nothing extra —
    // and every downstream step (conflict check, re-rank, publish) then
    // runs over local O(n) frames instead of re-executing the batch scan
    // per action. O(config) driver state, the codebook budget class.
    val candRows  = candidates.collect()
    val candLocal = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*), candidates.schema)
    // distinct before re-ranking: a replayed batch re-offers rows the
    // reservoir already holds; identical (key, weight) rows collapse so a
    // duplicate can never occupy two of the n slots (at-least-once delivery
    // makes a redelivery indistinguishable from a duplicate emission, so
    // set semantics is the only consistent choice).
    val pool =
      if (spark.catalog.tableExists(reservoir.qualifiedName))
        spark.table(reservoir.qualifiedName).unionByName(candLocal).distinct()
      else candLocal.distinct()
    // Key contract, ENFORCED: a key is a stable row identity whose weight is
    // a pure function of the key — the same determinism that makes replays
    // no-ops. A re-emitted key with a CHANGED weight would leave two rows
    // with different A-ES ranks both eligible for slots (silently neither
    // "the original" nor "the update"), so it fails fast here instead. The
    // check runs over the ≤2n-row merge pool only — O(config), never the
    // batch: a conflicting row that is not a batch top-n candidate cannot
    // touch the reservoir this batch, and a later emission that IS a
    // candidate gets checked on arrival.
    val conflicts = pool.groupBy(col(keyCol))
      .agg(countDistinct(col(weightCol)).as("__nw"))
      .where(col("__nw") > 1).select(col(keyCol)).limit(5).collect()
    require(conflicts.isEmpty,
      s"reservoir ${reservoir.qualifiedName}: key(s) re-emitted with a changed " +
        s"weight: ${conflicts.map(_.get(0)).mkString(", ")} — the reservoir " +
        "contract requires the weight to be a pure function of the key " +
        "(re-weighing a row breaks replay idempotence); rebuild the reservoir " +
        "or emit the row under a new key")
    val merged = Sampling.weightedSample(pool, keyCol, weightCol, n)
    // The merged plan READS the current generation's files; publish writes
    // the merge as the NEXT generation before flipping the view, so the
    // read-your-own-overwrite hazard does not arise (a plain
    // TableIO.overwrite would drop-and-delete the very files the lazy merge
    // plan still needs) and a mid-write crash leaves the previous
    // generation live.
    TableIO.publish(spark, merged, reservoir)
    spark.catalog.refreshTable(reservoir.qualifiedName)
  }
}
