package graft.similarity

import graft.functions.{AdcScoreExpr, NativeFunctions, PqEncodeExpr, PqLutExpr}
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-subspace PQ codebooks: `flat((j·k + c)·dsub + t)` is dim `t` of entry
  * `c` of subspace `j`'s codebook. Trained on L2-normalized vectors, so ADC
  * dot scores approximate cosine.
  */
case class PqCodebooks(m: Int, k: Int, dsub: Int, flat: Array[Float]) {
  def dim: Int = m * dsub
  require(flat.length == m * k * dsub, "codebook shape mismatch")
}

/** Embedding-space monitoring: per-group centroid drift between two corpus
  * snapshots — the representation-level complement of
  * [[graft.ops.Profile.drift]]'s scalar metrics (an embedding model swap or
  * a content shift moves centroids even when row counts hold steady).
  *
  * Scale shape: each side reduces to one partial-agg pass (per-group
  * element-wise sums + counts — map-side combine, groups × dim doubles);
  * the cosine between the two centroids is driver-trivial arithmetic done
  * in-plan. Vectors never join row-to-row.
  */
object EmbeddingDrift {
  import org.apache.spark.sql.DataFrame

  /** `(groupCol, n_before, n_after, centroid_cosine)` per group present on
    * both sides; cosine rounded to `roundTo`.
    *
    * Centroids via element-wise aggregation: vectors posexplode to
    * `(group, pos, value)` scalars (linear in n·dim, map-side partials),
    * the per-(group, pos) means re-assemble into a dim-length array with a
    * dim-BOUNDED collect_list — no group ever materializes its member
    * vectors in one buffer.
    */
  def centroidDrift(
      before: DataFrame,
      after: DataFrame,
      groupCol: String,
      vecCol: String,
      roundTo: Int = 6,
  ): DataFrame = {
    def centroids(df: DataFrame, tag: String): DataFrame =
      df.select(col(groupCol),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
        .groupBy(col(groupCol), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .groupBy(col(groupCol))
        .agg(
          max(col("n")).as(s"n_$tag"), // every pos sees each row once
          transform(
            array_sort(collect_list(struct(col("pos"), (col("s") / col("n")).as("m")))),
            x => x.getField("m")).as(s"c_$tag"),
        )
    val joined = centroids(before, "before").join(centroids(after, "after"), Seq(groupCol))
    val dot  = aggregate(zip_with(col("c_before"), col("c_after"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    def nrm(c: Column) =
      sqrt(aggregate(zip_with(c, c, (a, b) => a * b), lit(0.0), (acc, x) => acc + x))
    // a dim mismatch between snapshots must fail loudly — zip_with would
    // otherwise pad with nulls and silently yield null cosines
    val cosine = when(size(col("c_before")) === size(col("c_after")),
      dot / (nrm(col("c_before")) * nrm(col("c_after"))))
      .otherwise(raise_error(concat(
        lit("centroidDrift: embedding dims differ between snapshots for group "),
        col(groupCol).cast("string"))))
    joined.select(col(groupCol), col("n_before"), col("n_after"),
      round(cosine, roundTo).as("centroid_cosine"))
  }
}

/** Product-quantization ANN (Jégou et al., TPAMI 2011) — the 100 TB-scale
  * path for similarity search: raw float embeddings are 4·d bytes/row (256 B
  * at d=64) and can't all be rescanned per query batch; PQ codes are `m`
  * bytes/row (8 B at m=8 — 32×), so the scan that answers a query batch
  * reads 1/32nd the bytes, and the per-row score is m table lookups instead
  * of d multiplies. Combined with IVF cell pruning ([[buildPqIndex]]), a
  * query batch physically reads ~(nprobe/C)·(m/4d) of the raw corpus bytes.
  *
  * Recall comes from two dials: codebook resolution (m·log2 k bits/vector)
  * and exact RE-RANKING — ADC returns a top-`rerank` candidate pool, the
  * raw vectors of just those candidates are fetched (broadcast semi-join —
  * bounded by |queries|·rerank) and scored exactly. `rerank ≥ |corpus|`
  * degrades to exact brute force (recall 1.0), the oracle dial.
  *
  * Training (Lloyd's k-means per subspace) runs driver-side on a bounded
  * deterministic sample — same shape as IVF centroid sampling
  * ([[Ann.sampleCentroids]]): hash-of-id order makes it stable across
  * reruns and partitionings.
  */
object Pq {

  /** Train per-subspace codebooks on a deterministic sample of the corpus.
    *
    * @param m    number of subspaces (must divide the embedding dim)
    * @param k    codebook entries per subspace (≤ 256; codes are bytes)
    * @param sampleN sample size (driver-bounded; 2048 default)
    * @param iters Lloyd iterations (fixed count — deterministic)
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 8,
      k: Int = 16,
      sampleN: Int = 2048,
      iters: Int = 10,
  ): PqCodebooks = {
    require(k >= 1 && k <= 256, "k must be 1..256")
    val sample = corpus
      .select(xxhash64(col(idCol)).as("__h"), col(vecCol).as("__v"))
      .orderBy(col("__h"))
      .limit(sampleN)
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "PQ: empty corpus")
    val dim = sample.head.length
    // a ragged corpus must fail HERE with a clear message, not deep in the
    // subspace copy with an opaque ArrayIndexOutOfBounds
    val ragged = sample.indexWhere(_.length != dim)
    require(ragged < 0,
      s"PQ: all vectors must share one dimension; sampled vector #$ragged " +
        s"has ${sample(ragged max 0).length} dims, expected $dim")
    require(dim % m == 0, s"PQ: m=$m must divide dim=$dim")
    val dsub = dim / m
    // normalize the sample once (cosine convention)
    val normed = sample.map { v =>
      val ss = v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)
      if (ss > 0) { val inv = 1.0 / math.sqrt(ss); v.map(x => (x * inv).toFloat) } else v
    }
    val flat = new Array[Float](m * k * dsub)
    var j = 0
    while (j < m) {
      val sub  = normed.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      val cb   = lloyd(sub, k, iters)
      var c = 0
      while (c < k) {
        System.arraycopy(cb(c), 0, flat, (j * k + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    PqCodebooks(m, k, dsub, flat)
  }

  /** Deterministic Lloyd's k-means: init = first k sample points (hash
    * order), fixed `iters` rounds, ties to the lowest centroid index, an
    * emptied cluster keeps its previous centroid. Runs on ≤ sampleN points
    * of dsub dims — driver-trivial.
    */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val n    = points.length
    val dsub = points.head.length
    val cents = Array.tabulate(k)(c => points(c % n).clone())
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var t = 0
          while (t < dsub) {
            val diff = points(i)(t).toDouble - cents(c)(t).toDouble
            d += diff * diff
            t += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums   = Array.fill(k)(new Array[Double](dsub))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val c = assign(i)
        counts(c) += 1
        var t = 0
        while (t < dsub) { sums(c)(t) += points(i)(t); t += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var t = 0
          while (t < dsub) { cents(c)(t) = (sums(c)(t) / counts(c)).toFloat; t += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** PQ codes (m bytes) of a vector column. */
  def encode(vec: Column, cb: PqCodebooks): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec), cb.m, cb.k, cb.dsub, cb.flat))

  /** Per-query ADC lookup table (float[m·k]) of a vector column. */
  def lut(vec: Column, cb: PqCodebooks): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(vec), cb.m, cb.k, cb.dsub, cb.flat))

  /** ADC score of (codes, lut). */
  def adcScore(codes: Column, lutCol: Column, cb: PqCodebooks): Column =
    ColumnBridge.column(
      AdcScoreExpr(ColumnBridge.expression(codes), ColumnBridge.expression(lutCol), cb.k))

  /** ADC top-k with exact re-ranking. The corpus is scanned once: encode (or
    * pre-encoded codes via `codesCol`), score against each broadcast query
    * LUT, bounded-heap partial top-`rerank` per query; then the candidate
    * pool joins back to the raw vectors for exact cosine top-k. Corpus never
    * shuffles; candidate pool is |queries|·rerank rows (broadcast-small).
    *
    * `rerank <= k` skips the exact pass and returns ADC scores directly
    * (column still named `cosine` — it IS the cosine estimate).
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      cb: PqCodebooks,
      k: Int = 10,
      rerank: Int = 50,
  ): DataFrame = {
    val coded = corpus.select(
      col(corpusId).as("__nid"),
      encode(col(corpusVec), cb).as("__codes"),
    )
    adcThenRerank(coded, corpus, queries, corpusId, corpusVec, queryId, queryVec, cb, k, rerank)
  }

  /** Shared ADC → (optional) exact-rerank tail. `coded` is (__nid, __codes);
    * `rawCorpus` supplies exact vectors for the rerank join.
    */
  private def adcThenRerank(
      coded: DataFrame,
      rawCorpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      cb: PqCodebooks,
      k: Int,
      rerank: Int,
  ): DataFrame = {
    val q = queries.select(
      col(queryId).as("query_id"),
      lut(col(queryVec), cb).as("__lut"),
    )
    val scored = coded
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("__nid"),
        adcScore(col("__codes"), col("__lut"), cb).as("__sim"))
    rerankTail(scored, rawCorpus, queries, corpusId, corpusVec, queryId, queryVec, k, rerank)
  }

  /** ADC-scored rows → top-k, exact-reranking the top-`rerank` pool when
    * `rerank > k`.
    */
  private def rerankTail(
      scored: DataFrame,
      rawCorpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int,
      rerank: Int,
  ): DataFrame = {
    if (rerank <= k) Ann.topKOf(scored, k)
    else {
      // pool is |queries|·rerank rows — broadcast it against the raw corpus
      // so the corpus streams (no shuffle) and only candidates are scored
      val pool = Ann.topKOf(scored, rerank)
        .select(col("query_id"), col("neighbor_id"))
        .join(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qvec")),
          Seq("query_id"))
      val exact = rawCorpus
        .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__nvec"))
        .join(broadcast(pool), Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id").as("__nid"),
          cosine(col("__qvec"), col("__nvec")).as("__sim"))
      Ann.topKOf(exact, k)
    }
  }

  /** Persist an IVF-PQ index AT REST: coarse cells for pruning (reusing the
    * IVF layout — bucketed by cell) but storing `m`-byte PQ CODES instead of
    * raw vectors. At 100 TB of embeddings this is the difference between
    * rescanning the corpus (IVF-flat) and scanning a 32×-smaller code table.
    * Codebook + centroids persist alongside so later sessions query without
    * retraining.
    */
  def buildPqIndex(
      spark: SparkSession,
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      indexTable: graft.model.Table,
      centroidTable: graft.model.Table,
      codebookTable: graft.model.Table,
      m: Int = 8,
      k: Int = 16,
      numCentroids: Int = 64,
      numBuckets: Int = 16,
  ): PqCodebooks = {
    import spark.implicits._
    val cb    = train(corpus, corpusId, corpusVec, m, k)
    val cents = Ann.sampleCentroids(corpus, corpusId, corpusVec, numCentroids)
    graft.ops.TableIO.overwrite(spark,
      cents.zipWithIndex.toSeq.map { case (v, i) => (i, v.toSeq) }.toDF("cell", "centroid"),
      centroidTable)
    graft.ops.TableIO.overwrite(spark,
      Seq((cb.m, cb.k, cb.dsub, cb.flat.toSeq)).toDF("m", "k", "dsub", "flat"),
      codebookTable)
    val assigned = corpus.select(
      col(corpusId).as("id"),
      encode(col(corpusVec), cb).as("codes"),
      element_at(NativeFunctions.nearestCentroids(col(corpusVec), cents, 1), 1).as("cell"),
    )
    graft.ops.TableIO.overwriteBucketed(spark, assigned, indexTable,
      Seq("cell"), numBuckets, Seq("cell"))
    cb
  }

  /** Stream embeddings INTO a persisted IVF-PQ index (ANN index maintenance
    * under ingest — the similarity-side twin of the incremental-dedup
    * sinks): each micro-batch encodes against the PERSISTED codebook (no
    * retraining, so codes stay comparable across every batch ever
    * ingested), assigns its coarse cell, and bucket-appends to the code
    * table. Codebook and centroids load once per stream start, not per
    * batch. Replay semantics are the same honest at-least-once as the
    * dedup sinks: a replayed batch re-appends its rows — run AvailableNow
    * ingest or dedup by id downstream if exact-once matters.
    *
    * `numBuckets` must match the spec [[buildPqIndex]] created — Spark
    * rejects mismatched bucketed appends, so drift fails loudly.
    */
  def streamingIndexSink(
      spark: SparkSession,
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      indexTable: graft.model.Table,
      centroidTable: graft.model.Table,
      codebookTable: graft.model.Table,
      checkpointDir: String,
      numBuckets: Int = 16,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      await: Boolean = true,
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    require(spark.catalog.tableExists(indexTable.qualifiedName),
      s"PQ index ${indexTable.qualifiedName} must be built first (Pq.buildPqIndex)")
    val cb    = loadCodebook(spark, codebookTable)
    val cents = loadCentroids(spark, centroidTable)
    val query = stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val assigned = batch.select(
          col(idCol).as("id"),
          encode(col(vecCol), cb).as("codes"),
          element_at(NativeFunctions.nearestCentroids(col(vecCol), cents, 1), 1).as("cell"),
        )
        graft.ops.TableIO.appendBucketed(spark, assigned, indexTable,
          Seq("cell"), numBuckets, Seq("cell"))
        spark.catalog.refreshTable(indexTable.qualifiedName)
        ()
      }
      .start()
    if (await) query.awaitTermination()
    query
  }

  private def loadCodebook(
      spark: SparkSession, codebookTable: graft.model.Table): PqCodebooks = {
    val cbRow = spark.table(codebookTable.qualifiedName).collect().head
    PqCodebooks(cbRow.getAs[Int]("m"), cbRow.getAs[Int]("k"),
      cbRow.getAs[Int]("dsub"), cbRow.getSeq[Float](cbRow.fieldIndex("flat")).toArray)
  }

  private def loadCentroids(
      spark: SparkSession, centroidTable: graft.model.Table): Array[Array[Float]] =
    spark.table(centroidTable.qualifiedName)
      .orderBy(col("cell"))
      .select(col("centroid"))
      .collect()
      .map(_.getSeq[Float](0).toArray)

  /** Query a persisted IVF-PQ index: probed cells prune buckets at the scan
    * (same mechanism as [[Ann.queryIvfIndex]]), ADC scores the surviving
    * code rows, and the top-`rerank` pool re-ranks exactly against
    * `rawCorpus` (the source-of-truth embedding table — only the candidate
    * pool's vectors are ever read).
    */
  def queryPqIndex(
      spark: SparkSession,
      indexTable: graft.model.Table,
      centroidTable: graft.model.Table,
      codebookTable: graft.model.Table,
      rawCorpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      nprobe: Int = 8,
      rerank: Int = 50,
  ): DataFrame = {
    import spark.implicits._
    val cb    = loadCodebook(spark, codebookTable)
    val cents = loadCentroids(spark, centroidTable)
    val queryCells = queries.select(
      col(queryId).as("query_id"),
      lut(col(queryVec), cb).as("__lut"),
      explode(NativeFunctions.nearestCentroids(col(queryVec), cents, nprobe)).as("cell"),
    )
    val probed = queryCells.select(col("cell")).distinct().as[Int].collect()
    // each index row lives in exactly ONE cell, so the cell join yields each
    // (query, row) pair at most once — per-query pruning with no dup top-k
    val coded = spark.table(indexTable.qualifiedName)
      .where(col("cell").isin(probed.map(Int.box): _*))
      .select(col("id").as("__nid"), col("codes").as("__codes"), col("cell"))
    val scored = coded.join(broadcast(queryCells), Seq("cell"))
      .select(col("query_id"), col("__nid"),
        adcScore(col("__codes"), col("__lut"), cb).as("__sim"))
    rerankTail(scored, rawCorpus, queries, corpusId, corpusVec, queryId, queryVec, k, rerank)
  }
}
