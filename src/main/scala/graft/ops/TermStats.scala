package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus term statistics — the exact-integer core of TF-IDF ranking,
  * inverted-index construction, and vocabulary building (beyond-reference
  * scope: training-data curation; the reference delegates any such SQL to
  * its warehouses). Kept integer-only (tf, df, docs) so results are
  * engine-portable bit-for-bit; idf weighting (`ln(docs/df)` or variants)
  * is a trivial derived column the caller applies with the weighting of
  * their choice.
  *
  * Scale shape: both aggregations run with map-side partial aggregation
  * ((doc, term) then (term) — the second input is already one row per
  * doc-term, so document frequency is a plain count). The final join
  * re-shuffles by `term`, the same key the df aggregate just produced, so
  * AQE/exchange-reuse keeps it one effective repartition of each side. No
  * driver-side state, no vocabulary cap — a 100 TB corpus's term dictionary
  * stays distributed.
  */
object TermStats {

  /** Per-(doc, term) frequency joined with each term's document frequency:
    * `(idCol, term, tf, df)`. Tokenization is the engine-wide whitespace
    * rule ([[graft.functions.TextFunctions.tokens]], reused directly):
    * lower-cased, trimmed, split on runs of whitespace; blank documents
    * contribute no terms.
    *
    * @param minDf drop terms seen in fewer than this many documents (hapax
    *   pruning — the standard vocabulary-size lever; 1 keeps everything).
    */
  def termStats(df: DataFrame, idCol: String, textCol: String, minDf: Long = 1L): DataFrame = {
    require(minDf >= 1, "minDf must be >= 1")
    // TextFunctions.tokens: blank/whitespace-only text -> empty array, so
    // explode drops the row instead of minting a phantom "" term
    val toks = df.select(
      col(idCol),
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("term"),
    )
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
    tf.join(docFreq, Seq("term"))
      .select(col(idCol), col("term"), col("tf"), col("df"))
  }
}
