package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NativeFunctions, TextFunctions}
import graft.model.Table
import graft.ops.TableIO

/** Incremental deduplication against persisted dedup state — the
  * continuous-ingestion path a training-data pipeline actually runs. A
  * 100 TB corpus is not re-deduplicated per arriving batch: its dedup state
  * lives at rest (a fingerprint store for exact dedup, an LSH band index for
  * near-dup — both plain catalog tables, rebuildable and append-only), and
  * each batch checks against that state with only the BATCH ever hashed.
  *
  * Scale shape (both variants): the corpus-scale relation (store / index)
  * streams through exactly one scan with the batch side BROADCAST — the big
  * side is never shuffled, never re-hashed, and its scan cost is the floor
  * any membership check pays. Near-dup verify re-reads shingles for
  * candidate corpus docs only (a broadcast semi-join of candidate ids
  * against the at-rest corpus — point lookups, not a corpus pass with
  * payload shuffles).
  *
  * Reference analog: astro-sdk reruns its whole-table SQL transforms per
  * DAG run (python-sdk/src/astro/sql/operators/transform.py) — there is no
  * incremental dedup surface; this is a beyond-reference component sized
  * for the append-mostly corpora LLM pipelines curate.
  */
object IncrementalDedup {

  // ===== exact =====

  /** Materialize the corpus's normalized-text fingerprints as the at-rest
    * exact-dedup state: one `fp` (128-bit md5 of normalized text) per
    * distinct document body. 16 bytes/doc at rest, independent of document
    * size.
    */
  def buildFingerprintStore(
      spark: SparkSession,
      corpus: DataFrame,
      textCol: String,
      store: Table,
  ): Table =
    TableIO.overwrite(
      spark,
      corpus.select(TextFunctions.fingerprint(col(textCol)).as("fp")).distinct(),
      store)

  /** Keep the batch rows whose normalized text is NOT already in the store,
    * collapsing batch-internal exact duplicates onto the min-id survivor
    * first (same representative rule as [[Dedup.exact]]).
    *
    * The store scan streams once (batch fingerprints broadcast into a
    * semi-join); survivors are pinned via `localCheckpoint` BEFORE the store
    * is appended, so the returned DataFrame cannot observe its own update.
    */
  def dedupExactIncremental(
      spark: SparkSession,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      store: Table,
      updateStore: Boolean = true,
  ): DataFrame = {
    val withFp = batch.withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
    val w      = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    val firsts = withFp.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val batchFps = firsts.select(col("__fp")).distinct()
    val hits = spark.table(store.qualifiedName)
      .join(broadcast(batchFps), col("fp") === col("__fp"), "left_semi")
    val survivors = firsts
      .join(broadcast(hits), col("__fp") === col("fp"), "left_anti")
      .localCheckpoint(true)
    if (updateStore) {
      survivors.select(col("__fp").as("fp"))
        .write.mode(SaveMode.Append).saveAsTable(store.qualifiedName)
      // The append runs in `batch`'s session — inside foreachBatch that is a
      // CLONE of `spark`, and the write invalidates only the clone's relation
      // cache. Refresh `spark`'s entry so its next read of the store lists
      // the appended files instead of a stale cached snapshot.
      spark.catalog.refreshTable(store.qualifiedName)
    }
    survivors.drop("__fp")
  }

  // ===== perceptual / 64-bit similarity hashes =====

  /** Materialize a corpus's 64-bit similarity hashes (dHash/SimHash) as the
    * at-rest near-dup state: pigeonhole chunk rows `(id, chunk, val, sim)` —
    * `maxHamming + 1` rows × 28 bytes per item, the image/audio analog of
    * [[buildLshIndex]]. `maxHamming` is baked into the index layout (it
    * fixes the chunk count), so later [[dedupHash64Incremental]] calls must
    * use the same value.
    */
  def buildHash64Index(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      hashCol: String,
      index: Table,
      maxHamming: Int = 3,
  ): Table =
    TableIO.overwrite(spark,
      Dedup.hash64Chunks(corpus, idCol, hashCol, maxHamming + 1), index)

  /** Keep the batch rows whose hash is NOT within `maxHamming` of any
    * indexed hash. The index streams one scan with the batch's chunk rows
    * broadcast; the stored `sim` rides the index row (8 bytes), so the
    * popcount verify is inline — no second corpus pass at all, unlike the
    * shingle variant's set re-join. With `updateIndex`, survivors' chunks
    * append (checkpoint-pinned first), so the next batch also dedups
    * against everything admitted so far.
    */
  def dedupHash64Incremental(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      hashCol: String,
      index: Table,
      maxHamming: Int = 3,
      updateIndex: Boolean = true,
  ): DataFrame = {
    val chunks = maxHamming + 1
    val bChunks = Dedup.hash64Chunks(batch, idCol, hashCol, chunks)
      .toDF("batch_id", "batch_sim", "chunk", "val")
    val dup = spark.table(index.qualifiedName)
      .join(broadcast(bChunks), Seq("chunk", "val"))
      .where(call_function("bit_count",
        col("sim").bitwiseXOR(col("batch_sim"))) <= maxHamming)
      .select(col("batch_id")).distinct()
    val survivors = batch
      .join(broadcast(dup), col(idCol) === col("batch_id"), "left_anti")
      .localCheckpoint(true)
    if (updateIndex) {
      Dedup.hash64Chunks(survivors, idCol, hashCol, chunks)
        .write.mode(SaveMode.Append).saveAsTable(index.qualifiedName)
      spark.catalog.refreshTable(index.qualifiedName)
    }
    survivors
  }

  // ===== decontamination =====

  /** Materialize an eval corpus's distinct k-word grams as the at-rest
    * decontamination state: one 16-byte md5 key per distinct gram. Eval
    * sets accrete over time (new benchmarks arrive); the store is the
    * append-target, the training corpus never re-derives eval grams.
    */
  def buildGramStore(
      spark: SparkSession,
      evalDf: DataFrame,
      textCol: String,
      store: Table,
      gramK: Int = 8,
  ): Table =
    TableIO.overwrite(
      spark,
      evalDf.select(explode(TextFunctions.wordShingles(col(textCol), gramK)).as("gram"))
        .select(md5(col("gram")).as("g")).distinct(),
      store)

  /** Ids of batch docs sharing ANY k-gram with the persisted store — the
    * continuous-ingestion face of [[Dedup.contaminated]]. Same scan shape
    * as the other incremental checks: the store streams once with the
    * batch's (distinct) gram keys broadcast into a semi-join; only the
    * batch is ever shingled.
    */
  def contaminatedIncremental(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      store: Table,
      gramK: Int = 8,
  ): DataFrame = {
    val bg = batch
      .select(col(idCol), explode(TextFunctions.wordShingles(col(textCol), gramK)).as("gram"))
      .select(col(idCol), md5(col("gram")).as("g"))
    val hits = spark.table(store.qualifiedName)
      .join(broadcast(bg.select(col("g")).distinct()), Seq("g"), "left_semi")
    bg.join(broadcast(hits), Seq("g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  // ===== near-dup (MinHash LSH) =====

  /** Materialize the corpus's LSH band index as the at-rest near-dup state:
    * `(id, band, bucket)` rows — ~24 bytes × bands per doc, no payloads.
    * Parameters must match the later [[dedupNearIncremental]] calls (they
    * define the banding scheme the index is keyed by).
    */
  def buildLshIndex(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      index: Table,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleK: Int = 3,
  ): Table = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val sets = corpus.select(
      col(idCol).as("id"),
      NativeFunctions.shingleHashes(col(textCol), shingleK).as("sh"))
    TableIO.overwrite(spark, Dedup.banded(sets, numHashes, bands), index)
  }

  /** Keep the batch rows with no near-duplicate (exact Jaccard ≥ threshold
    * over k-word shingles) in the indexed corpus. Candidate generation is
    * the index scan joined against the broadcast batch bands; the verify
    * re-reads shingles for candidate corpus docs only. Batch-internal
    * near-dups are a separable concern — run [[Dedup.dedupNear]] on the
    * batch first if the arrival stream itself carries duplicates.
    *
    * With `updateIndex` the survivors' bands append to the index, so the
    * next batch dedups against corpus + everything admitted so far (the
    * caller's ingest step appends the survivors themselves to the at-rest
    * corpus). Survivors are checkpoint-pinned before the append, as in the
    * exact variant. Banding dial: same trade as [[Dedup.recallExactBands]] —
    * r=4 for production thresholds, the recall-exact r for oracle checks.
    */
  def dedupNearIncremental(
      spark: SparkSession,
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      index: Table,
      threshold: Double = 0.7,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleK: Int = 3,
      updateIndex: Boolean = true,
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    def sets(df: DataFrame, as: String) = df.select(
      col(idCol).as(as),
      NativeFunctions.shingleHashes(col(textCol), shingleK).as(s"${as}_sh"))

    val bSets  = sets(batch, "batch_id")
    val bBands = Dedup.banded(
      bSets.select(col("batch_id").as("id"), col("batch_id_sh").as("sh")),
      numHashes, bands)
    // corpus-scale index: ONE streamed scan, batch bands broadcast;
    // candidates are batch-sized — pin them so the two downstream uses
    // (id fetch + verify join) don't rescan the index
    val candidates = spark.table(index.qualifiedName)
      .join(broadcast(bBands.withColumnRenamed("id", "batch_id")), Seq("band", "bucket"))
      .select(col("batch_id"), col("id").as("corpus_id"))
      .dropDuplicates("batch_id", "corpus_id")
      .localCheckpoint(true)
    val candIds = candidates.select(col("corpus_id")).distinct()
    // semi-join the RAW corpus first so the shingle projection runs only
    // over candidate rows (the optimizer won't push a join below the
    // projection for us; shingling 100 TB to then drop 99.9% of it would
    // be the hidden cost here)
    val cSets = sets(
      corpus.join(broadcast(candIds), col(idCol) === col("corpus_id"), "left_semi"),
      "corpus_id")
    val dup = candidates
      .join(bSets, Seq("batch_id"))
      .join(cSets, Seq("corpus_id"))
      .where(NativeFunctions.jaccardSorted(col("batch_id_sh"), col("corpus_id_sh")) >= threshold)
      .select(col("batch_id")).distinct()
    val survivors = batch
      .join(broadcast(dup), col(idCol) === col("batch_id"), "left_anti")
      .localCheckpoint(true)
    if (updateIndex) {
      val sSets = survivors.select(
        col(idCol).as("id"),
        NativeFunctions.shingleHashes(col(textCol), shingleK).as("sh"))
      Dedup.banded(sSets, numHashes, bands)
        .write.mode(SaveMode.Append).saveAsTable(index.qualifiedName)
      // see dedupExactIncremental: the write may run in a cloned session
      // (foreachBatch) whose cache invalidation doesn't reach `spark`
      spark.catalog.refreshTable(index.qualifiedName)
    }
    survivors
  }
}
