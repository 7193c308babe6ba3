package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style composite document-quality rules (Rae et al. 2021,
  * arXiv:2112.11446 Appendix A — the published heuristic battery most
  * curation pipelines start from). Beyond-reference scope: training-data
  * curation. One projection, all codegen'd builtins — no UDF, no shuffle;
  * at 100 TB this runs at scan speed next to the parquet reader.
  *
  * Semantics pinned for the DuckDB oracle:
  *  - words = whitespace split of trimmed text; lines = split on \n.
  *  - symbol ratio counts '#' chars and NON-OVERLAPPING '...' runs (both
  *    engines count via length-delta of replace) plus '…', per word.
  *  - bullet lines start with '•', '*' or '-' after trim; ellipsis lines
  *    end with '...' or '…' after trim.
  *  - required stopwords: the Gopher eight (the, be, to, of, and, that,
  *    have, with), counted as DISTINCT lowercase token hits.
  */
object QualityRules {

  val requiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Append the rule columns + `passes`: (n_words, mean_word_len,
    * symbol_ratio, bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
    * n_required_stopwords, passes). Ratios rounded to 4 decimals.
    */
  def gopherFlags(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minRequiredStopwords: Int = 2,
  ): DataFrame = {
    val t     = trim(col(textCol))
    val words = split(t, "\\s+")
    val lowerWords = split(lower(t), "\\s+")
    val lines = transform(split(col(textCol), "\n"), l => trim(l))
    def occurrences(c: Column, s: String, w: Int): Column =
      (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(s), ""))) / w
    val nWords = when(t === "", lit(0)).otherwise(size(words))
    val out = df
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len",
        round(when(nWords === 0, lit(0.0)).otherwise(
          aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / nWords), 4))
      .withColumn("symbol_ratio",
        round(when(nWords === 0, lit(0.0)).otherwise(
          (occurrences(t, "#", 1) + occurrences(t, "...", 3) + occurrences(t, "…", 1))
            .cast("double") / nWords), 4))
      .withColumn("bullet_line_frac",
        round(size(filter(lines, l =>
          l.startsWith("•") || l.startsWith("*") || l.startsWith("-")))
          .cast("double") / size(lines), 4))
      .withColumn("ellipsis_line_frac",
        round(size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
          .cast("double") / size(lines), 4))
      .withColumn("alpha_word_frac",
        round(when(nWords === 0, lit(0.0)).otherwise(
          size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double") / nWords), 4))
      .withColumn("n_required_stopwords",
        // count of the eight required stopwords PRESENT (not token hits) —
        // spelled as filter-over-the-constant-list so the DuckDB oracle
        // can mirror it without set-semantics ambiguity
        size(filter(array(requiredStopwords.map(lit): _*), s =>
          array_contains(lowerWords, s))).cast("long"))
    out.withColumn("passes",
      col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
        col("symbol_ratio") <= maxSymbolRatio &&
        col("bullet_line_frac") <= maxBulletLineFrac &&
        col("ellipsis_line_frac") <= maxEllipsisLineFrac &&
        col("alpha_word_frac") >= minAlphaWordFrac &&
        col("n_required_stopwords") >= minRequiredStopwords)
      .select(col(idCol), col("n_words"), col("mean_word_len"), col("symbol_ratio"),
        col("bullet_line_frac"), col("ellipsis_line_frac"), col("alpha_word_frac"),
        col("n_required_stopwords"), col("passes"))
  }

  /** Per-group EXACT percentile trim: within each group, keep the rows whose
    * rank under the total order (`valueCol`, `idCol`) lies in
    * (floor(pLow·n), ceil(pHigh·n)] — the "drop the top/bottom tail per
    * domain" outlier gate (extreme-length docs, degenerate scores) that
    * static bounds (gopherFlags) can't express when the distribution varies
    * by group.
    *
    * Scale shape: ONE shuffle by the group key; rank is a per-group window
    * (linear scan after the group sort). The id tie-break makes the cut
    * deterministic under duplicate values. For groups too large to sort
    * (one domain = half the corpus), compute approximate cutoffs instead
    * (`percentile_approx` per group — a combiner-friendly aggregate — then
    * broadcast-join and filter, no sort at all); the exact rank form here
    * is the oracle-checkable dial and the right choice whenever per-group
    * row counts are executor-sortable.
    *
    * Output: kept rows as (idCol, groupCols…, valueCol, rank, n_in_group).
    */
  def trimOutliersByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      idCol: String,
      pLow: Double,
      pHigh: Double,
  ): DataFrame = {
    require(pLow >= 0.0 && pHigh <= 1.0 && pLow < pHigh, "need 0 <= pLow < pHigh <= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col(idCol))
    // __-prefixed internals (the repo-wide convention): withColumn REPLACES
    // an identically-named existing column, so computing straight into
    // `rank`/`n_in_group` would silently corrupt the trim predicate for any
    // caller whose frame already carries those names
    val ranked = df
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__n_in_group",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)).cast("long"))
    ranked
      .where(col("__rank") > floor(lit(pLow) * col("__n_in_group")) &&
        col("__rank") <= ceil(lit(pHigh) * col("__n_in_group")))
      .select((Seq(col(idCol)) ++ groupCols.map(col) ++
        Seq(col(valueCol), col("__rank").as("rank"),
          col("__n_in_group").as("n_in_group"))): _*)
  }

  /** The NO-SORT scale path [[trimOutliersByGroup]]'s scaladoc promises —
    * for groups too large to sort on one executor (one domain = half the
    * corpus): per-group (pLow, pHigh) cutoffs from `percentile_approx`
    * (a combiner-friendly sketch aggregate — partial state is the sketch,
    * not the rows), broadcast back, and filter. Two corpus scans, ZERO
    * sorts, no window.
    *
    * Semantics difference, stated plainly: the exact form trims by RANK
    * (ties split across the cut deterministically by id); this form trims
    * by VALUE — every row tied at a cutoff lands on the same side. On
    * value distributions without heavy ties at the cut points the kept
    * sets agree (QualityRulesSpec pins this on a clean fixture); under
    * heavy ties the approximate form keeps whole tie-groups AT BOTH cuts
    * (`>= lo` and `<= hi`), which for an outlier gate is the conservative
    * reading — and it makes the degenerate all-ties group (lo == hi from
    * the sketch) keep everything rather than silently empty. Agreement
    * with the exact rank form on the sf fixture is hash-gated cross-engine
    * by q190. Output: kept rows as (idCol, groupCols…, valueCol) — no
    * ranks, nothing was ranked.
    */
  def trimOutliersByGroupApprox(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      idCol: String,
      pLow: Double,
      pHigh: Double,
      accuracy: Int = 10000,
  ): DataFrame = {
    require(pLow >= 0.0 && pHigh <= 1.0 && pLow < pHigh, "need 0 <= pLow < pHigh <= 1")
    require(accuracy >= 100, "accuracy < 100 degrades the cutoffs to guesswork")
    val bounds = df
      .groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(lit(pLow), lit(pHigh)), lit(accuracy)).as("__b"))
      .select((groupCols.map(col) :+ element_at(col("__b"), 1).as("__lo")
        :+ element_at(col("__b"), 2).as("__hi")): _*)
    df.join(broadcast(bounds), groupCols)
      .where(col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
      .select((Seq(col(idCol)) ++ groupCols.map(col) :+ col(valueCol)): _*)
  }
}
