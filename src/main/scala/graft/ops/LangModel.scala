package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model scoring for corpus quality filtering — the
  * CCNet-style "perplexity against a reference corpus" primitive (Wenzek
  * et al. 2020, arXiv:1911.00359: docs whose LM score is an outlier are
  * machine-generated/boilerplate/low-quality candidates). Beyond-reference
  * scope: training-data curation (cf. SURVEY.md §2 LLM-pipeline addenda).
  *
  * Model: add-one-smoothed bigram LM, P(w2|w1) = (c(w1,w2) + 1) /
  * (c(w1) + V), trained on `train`'s whitespace tokens (the engine-wide
  * tokenization rule, [[graft.functions.TextFunctions.tokens]]). Scores are
  * bits per bigram: -mean log2 P. Everything upstream of the single log2
  * is exact-integer, so the DuckDB oracle reproduces the counts
  * bit-for-bit and the score to rounding.
  *
  * Scale shape (100 TB corpus, reference-corpus training):
  *  - training is two map-side-partial count aggregations (the TermStats
  *    shape) — the model is (token, c) + (bigram, c) tables, NOT driver
  *    state; natural-language vocabularies keep both far below corpus
  *    size, and the score join shuffles by bigram key only (16-byte rows),
  *    never the document text.
  *  - scoring joins are left joins on (w1) and (w1, w2) — Spark broadcasts
  *    them when the model is small (the common case for a reference LM)
  *    and falls back to shuffle joins when it isn't; either way the plan
  *    is two equi-joins + one per-doc aggregate.
  *  - unseen bigrams are *counted* (`n_unseen`) as well as smoothed into
  *    the score: the OOV rate is itself a standard quality signal.
  */
object LangModel {

  private def bigrams(toks: org.apache.spark.sql.Column) =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2), i =>
        struct(element_at(toks, i + 1).as("w1"), element_at(toks, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Score `docs` against a bigram LM trained on `train` (pass the same
    * DataFrame to self-score a corpus for outlier filtering). Output:
    * `(idCol, n_tokens, n_bigrams, n_unseen, bits_per_bigram)` — counts
    * exact integers, `bits_per_bigram` = -mean log2 P rounded to
    * `roundTo`, 0.0 for docs with no bigram.
    *
    * `maxVocab` / `maxBigrams` bound the MODEL, not the corpus: keep only
    * the top-K unigrams/bigrams by count (ties broken by key, so the
    * pruned model is deterministic and engine-portable — DuckDB mirrors it
    * with a `QUALIFY row_number()`), everything pruned scores as unseen,
    * and V in the add-one smoothing is the PRUNED vocab size. This is
    * CCNet's own production shape — a FIXED reference LM whose size does
    * not grow with the training split — and it turns both scoring joins
    * into broadcasts: at 100 TB the corpus streams past a few-MB model
    * instead of shuffling by bigram key. Defaults (unbounded) preserve the
    * exact self-scoring dial.
    */
  def scoreBigram(
      train: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      roundTo: Int = 3,
      maxVocab: Int = Int.MaxValue,
      maxBigrams: Int = Int.MaxValue,
  ): DataFrame = {
    require(maxVocab > 0 && maxBigrams > 0, "model bounds must be positive")
    val trainToks = train.select(
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("w"))
    val uniFull = trainToks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    // top-K = orderBy+limit → TakeOrderedAndProject: a distributed heap
    // per partition + one K-row merge, never a full sort
    val uni =
      if (maxVocab == Int.MaxValue) uniFull
      else uniFull.orderBy(col("c1").desc, col("w")).limit(maxVocab)
    val vocab = uni.count() // one small job; V is a scalar in the formula
    val biFull = train.select(
        explode(bigrams(graft.functions.TextFunctions.tokens(lower(col(textCol))))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val bi =
      if (maxBigrams == Int.MaxValue) biFull
      else biFull.orderBy(col("c12").desc, col("w1"), col("w2")).limit(maxBigrams)
    val pruned = maxVocab != Int.MaxValue || maxBigrams != Int.MaxValue

    val docToks = docs.select(col(idCol),
      graft.functions.TextFunctions.tokens(lower(col(textCol))).as("toks"))
    val counts = docToks.select(col(idCol), size(col("toks")).cast("long").as("n_tokens"),
      col("toks"))
    val docBi = counts.select(col(idCol), col("n_tokens"),
        explode_outer(bigrams(col("toks"))).as("b"))
      .select(col(idCol), col("n_tokens"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // a bounded model is broadcast-safe BY CONSTRUCTION — hint it so the
    // doc scan never shuffles; the unbounded dial lets Catalyst/AQE decide
    val uniJ = { val u = uni.withColumnRenamed("w", "w1"); if (pruned) broadcast(u) else u }
    val biJ  = if (pruned) broadcast(bi) else bi
    val scored = docBi
      .join(uniJ, Seq("w1"), "left")
      .join(biJ, Seq("w1", "w2"), "left")
      .withColumn("__p",
        (coalesce(col("c12"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + vocab).cast("double"))
      .groupBy(col(idCol), col("n_tokens"))
      .agg(
        count(col("w1")).as("n_bigrams"),
        sum(when(col("w1").isNotNull && col("c12").isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(when(col("w1").isNotNull, -log2(col("__p")))).as("__bits"))
      .select(col(idCol), col("n_tokens"), col("n_bigrams"), col("n_unseen"),
        round(coalesce(col("__bits") / col("n_bigrams"), lit(0.0)), roundTo)
          .as("bits_per_bigram"))
    scored
  }

  /** CCNet's selection step (Wenzek et al. 2020 §4.3): bucket every doc
    * into `head` / `middle` / `tail` by LM score WITHIN its group (CCNet
    * groups by language; any column works — source, domain, snapshot).
    * Head = lowest perplexity. Output: `(idCol, groupCol, n_tokens,
    * bits_per_bigram, ppl_bucket)`.
    *
    * Exact terciles via `ntile` over (score, id) — the id tie-break makes
    * the order total, so bucket assignment is deterministic and
    * engine-portable. Scale note: this is CCNet's own per-language global
    * sort — one shuffle per group member, bounded group count; for
    * pathologically dominant groups the approx-percentile-threshold
    * variant (two scans, no sort) is the drop-in alternative, at the cost
    * of the exact-tercile contract this op pins.
    */
  /** The no-sort variant of [[perplexityBuckets]] for pathologically
    * dominant groups: per-group bucket THRESHOLDS from a percentile sketch
    * (one aggregate, map-side partials), then bucket assignment as a
    * scan-speed comparison against the broadcast threshold row — no
    * per-group sort anywhere. Trades the exact-tercile contract for
    * sketch accuracy (and threshold-tie docs land together instead of
    * splitting); agreement with the exact op is pinned in LangModelSpec.
    */
  def perplexityBucketsApprox(
      train: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      buckets: Int = 3,
      accuracy: Int = 10000,
  ): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val scored = scoreBigram(train, docs, idCol, textCol)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
    val probs = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val th = scored.groupBy(col(groupCol))
      .agg(percentile_approx(col("bits_per_bigram"), array(probs: _*), lit(accuracy)).as("__th"))
    scored.join(broadcast(th), Seq(groupCol))
      .withColumn("__nt",
        (size(filter(col("__th"), t => col("bits_per_bigram") > t)) + 1))
      .withColumn("ppl_bucket",
        when(col("__nt") === 1, "head")
          .when(col("__nt") === buckets, "tail")
          .otherwise("middle"))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        col("bits_per_bigram"), col("ppl_bucket"))
  }

  def perplexityBuckets(
      train: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      buckets: Int = 3,
      maxVocab: Int = Int.MaxValue,
      maxBigrams: Int = Int.MaxValue,
  ): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val scored = scoreBigram(train, docs, idCol, textCol,
        maxVocab = maxVocab, maxBigrams = maxBigrams)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("bits_per_bigram"), col(idCol))
    scored
      .withColumn("__nt", ntile(buckets).over(w))
      .withColumn("ppl_bucket",
        when(col("__nt") === 1, "head")
          .when(col("__nt") === buckets, "tail")
          .otherwise("middle"))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        col("bits_per_bigram"), col("ppl_bucket"))
  }
}
