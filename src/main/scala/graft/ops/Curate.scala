package graft.ops

import graft.dedup.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call curation pipeline — the composed "raw corpus in, training
  * corpus out" funnel, each stage of which is a standalone operator used
  * elsewhere in this library:
  *
  *   exact dedup → token-count quality bounds → decontamination against an
  *   eval corpus → temperature mixture over the language column
  *
  * Stages compose LAZILY: each returned DataFrame is one Catalyst plan, so
  * Catalyst optimizes across stage boundaries (the quality filter's column
  * pruning reaches the dedup window's scan, AQE replans every exchange),
  * and nothing materializes unless the caller asks. The one eager step is
  * the mixture's bounded group-count collect ([[Sampling.temperatureMixture]]).
  *
  * [[funnel]] turns the staged frames into the (stage, rows) report a
  * curation run logs — one count scan per stage; callers who only want the
  * final corpus never pay for it.
  */
object Curate {

  /** Staged pipeline: `(stageName, survivorsSoFar)` in application order,
    * starting with `("input", corpus)` and ending with the curated corpus.
    */
  def pipeline(
      corpus: DataFrame,
      evalDf: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      minTokens: Int = 20,
      maxTokens: Int = 100000,
      gramK: Int = 8,
      alpha: Double = 0.5,
  ): Seq[(String, DataFrame)] = {
    val deduped = Dedup.exact(corpus, textCol, idCol)
    val quality = deduped.where(
      TextFunctions.tokenCount(col(textCol)).between(minTokens, maxTokens))
    val hits  = Dedup.contaminated(quality, evalDf, idCol, textCol, gramK)
    val clean = quality.join(broadcast(hits), col(idCol) === col("id"), "left_anti")
    val mixed = Sampling.temperatureMixture(clean, langCol, idCol, alpha)
    Seq(
      "input"        -> corpus,
      "exact_dedup"  -> deduped,
      "quality"      -> quality,
      "decontaminated" -> clean,
      "mixture"      -> mixed,
    )
  }

  /** The funnel report: one `(stage, n_docs)` row per stage, stage order
    * preserved via an explicit ordinal so downstream sorts are stable.
    */
  def funnel(stages: Seq[(String, DataFrame)]): DataFrame =
    stages.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(i.toLong).as("stage_no"), lit(name).as("stage"), col("n_docs"))
    }.reduce(_.unionByName(_))
}
