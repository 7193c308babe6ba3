package graft.ops

import graft.model.Table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable sketches — incremental corpus statistics without
  * rescans. A 100 TB corpus can't recount distincts per report; HLL
  * sketches (Apache DataSketches, built into Spark as `hll_sketch_agg` /
  * `hll_union_agg`) are tiny (≤ 2^lgK bytes per group), MERGEABLE (union
  * of shard sketches = sketch of the union, exactly), and append-only:
  * each ingested batch contributes one sketch row per group, and any later
  * estimate is an aggregate over the sketch table alone.
  *
  * Exactness note (pinned in SketchesSpec): below ~0.75·2^lgK distincts a
  * sketch is still in its exact coupon-list mode, so estimates are EXACT —
  * which is what makes the q139 oracle possible at fixture scale; at real
  * scale the estimate carries the standard ~1.6%/√(2^lgK) HLL error.
  */
object Sketches {

  /** Overwrite the sketch store with per-group sketches of `df`. */
  def buildDistinctStore(
      spark: SparkSession,
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      table: Table,
      lgK: Int = 12,
  ): Unit =
    TableIO.overwrite(spark, sketchOf(df, groupCol, valueCol, lgK), table)

  /** Append a new batch's sketches (one row per group per batch). The
    * store's persisted `lg_k` is authoritative: an append at a different
    * precision is a hard error, not a silent `allowDifferentLgConfigK`
    * downgrade (a union across configs drops to the smaller lgK, breaking
    * the documented coupon-exact regime).
    */
  def appendDistinctStore(
      spark: SparkSession,
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      table: Table,
      lgK: Int = 12,
  ): Unit = {
    val storeLgK = spark.table(table.qualifiedName)
      .select(max(col("lg_k"))).collect().head
    if (!storeLgK.isNullAt(0))
      require(storeLgK.getInt(0) == lgK,
        s"Sketch store ${table.qualifiedName} was built with lgK=${storeLgK.getInt(0)}; " +
          s"appending a batch at lgK=$lgK would silently downgrade precision. " +
          "Pass the store's lgK (or rebuild the store).")
    sketchOf(df, groupCol, valueCol, lgK)
      .write.mode("append").saveAsTable(table.qualifiedName)
    spark.catalog.refreshTable(table.qualifiedName)
  }

  private def sketchOf(df: DataFrame, groupCol: String, valueCol: String, lgK: Int): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
      .withColumn("lg_k", lit(lgK))

  /** Distinct-count estimates from the store alone: union the per-batch
    * sketches per group, estimate. Never touches the source data. The
    * store is lgK-homogeneous by construction, so cross-config unions are
    * rejected (allowDifferentLgConfigK=false) — precision never degrades
    * silently.
    */
  def estimateDistinct(spark: SparkSession, table: Table): DataFrame =
    spark.table(table.qualifiedName)
      .groupBy(col("grp"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("distinct_est"))
}
