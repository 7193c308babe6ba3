package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join — edit-distance entity resolution at corpus
  * scale (name/title dedup across merged catalog drops, the record-linkage
  * step a training-data pipeline runs before entity-level dedup).
  *
  * Shape: never all-pairs. Rows equi-join on a user-supplied blocking key
  * (first token, soundex-ish prefix, zip code …) so candidate volume is
  * Σ_b |b|², bounded by `maxBucketSize` per block; `levenshtein(...)` (the
  * codegen'd built-in) filters candidates to true matches. This is the
  * classic blocking+verify linkage design — the same cap-the-bucket
  * discipline as the MinHash-LSH near-dup path (dedup/Dedup.scala).
  *
  * At 100 TB: the join is a plain shuffle equi-join on the block key (both
  * sides partition by block — co-located, AQE-skew-splittable); no state
  * beyond a bucket; a hot block (empty key, "the", …) is truncated at
  * `maxBucketSize` deterministically (lowest ids kept) instead of going
  * quadratic — dial it to ∞ only when the key is known well-distributed.
  */
object FuzzyJoin {

  /** Match pairs (id_a < id_b) whose `textCol` values share `blockKey` and
    * are within `maxDistance` edits. Output: (id_a, id_b, dist).
    */
  def fuzzySelfJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockKey: Column,
      maxDistance: Int,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    val keyed = df.select(
      col(idCol).cast("long").as("fz_id"),
      col(textCol).as("fz_text"),
      blockKey.cast("string").as("fz_block"))
    // deterministic bucket cap BEFORE the self-join: a skewed block degrades
    // to maxBucketSize² work, never |block|²
    val capped = keyed
      .withColumn("fz_rn", row_number().over(Window.partitionBy("fz_block").orderBy("fz_id")))
      .filter(col("fz_rn") <= maxBucketSize)
      .drop("fz_rn")
    val a = capped.select(col("fz_block"), col("fz_id").as("id_a"), col("fz_text").as("t_a"))
    val b = capped.select(col("fz_block"), col("fz_id").as("id_b"), col("fz_text").as("t_b"))
    a.join(b, Seq("fz_block"))
      .filter(col("id_a") < col("id_b"))
      // cheap codegen'd length prefilter: |len(a)-len(b)| > d ⇒ dist > d,
      // skips the edit-distance DP for most candidates
      .filter(abs(length(col("t_a")) - length(col("t_b"))) <= maxDistance)
      // BANDED levenshtein (threshold form): O(d·len) instead of O(len²),
      // -1 when the distance exceeds d — the same rewrite
      // plans.LevenshteinThresholdRewrite applies to user SQL. Round 17:
      // the graft expression additionally trims the candidates' common
      // prefix/suffix before the DP — blocked candidates share their
      // whole blocking key, so the per-pair DP collapses to a few cells
      // (q159's phase profile put ~2.9 s of 3.5 s in the built-in calls);
      // values are pinned identical to the built-in by LevThreshSpec.
      .withColumn("dist",
        graft.functions.NativeFunctions.levThresh(col("t_a"), col("t_b"), maxDistance)
          .cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
