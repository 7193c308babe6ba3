package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy sequence packing: assign documents to fixed-token-budget packs —
  * the "sample packing" step that turns a deduped corpus into training
  * context windows. Documents are processed per group (e.g. per language /
  * source) in ascending id order; a document opens a new pack when adding it
  * would exceed `budget` (documents larger than the budget get a pack of
  * their own).
  *
  * Scale shape: ONE shuffle (repartition by group) + sortWithinPartitions
  * (group, id) + a mapPartitions that detects group boundaries — the
  * classic secondary-sort pattern. Running state is O(1) per partition
  * (current group, running sum, pack counter); no group is ever
  * materialized, so a group holding 90% of the corpus still streams.
  * Assignment is a pure function of (group, id-order, token counts) — no
  * RNG — so reruns and re-shards produce identical packs.
  */
object Packing {

  def packGreedy(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokenCol: String,
      budget: Long,
  ): DataFrame = {
    require(budget > 0, "budget must be positive")
    val prepared = df
      .select(col(groupCol).cast("string").as("grp"), col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tokens"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("id"))
    val schema = StructType(Seq(
      StructField("grp", org.apache.spark.sql.types.StringType, nullable = true),
      StructField("id", LongType, nullable = false),
      StructField("tokens", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
    ))
    prepared.mapPartitions { rows =>
      var curGrp: String = null
      var acc: Long      = 0L
      var pack: Long     = 0L
      var first          = true
      rows.map { r =>
        val grp = r.getString(0)
        // A null id/token count (e.g. tokenCount of a null text column) would
        // otherwise surface as an opaque NullPointerException from getLong —
        // and the declared nullable=false schema would be a lie.
        if (r.isNullAt(1))
          throw new IllegalArgumentException(
            s"packGreedy: null $idCol — document ids must be non-null (filter or fill first)")
        if (r.isNullAt(2))
          throw new IllegalArgumentException(
            s"packGreedy: null $tokenCol for id=${r.getLong(1)} — token counts must be " +
              "non-null (a null text column yields a null tokenCount; filter or fill first)")
        val id     = r.getLong(1)
        val tokens = r.getLong(2)
        if (first || grp != curGrp) {
          curGrp = grp; acc = tokens; pack = 0L; first = false
        } else if (acc + tokens > budget) {
          pack += 1; acc = tokens
        } else {
          acc += tokens
        }
        Row(grp, id, tokens, pack)
      }
    }(RowEncoder.encoderFor(schema))
  }
}
