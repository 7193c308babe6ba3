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

  /** GPT-style concat-and-chunk packing into FIXED context windows: append
    * an EOS id to every document's id array, concatenate all documents in a
    * deterministic global order (hash-of-id, id), and cut the resulting
    * token stream into windows of exactly `windowSize` ids — documents
    * straddle window boundaries, exactly as LLaMA/GPT pretraining packs.
    * The final partial window pads with `padId`. Output:
    * `(window_id, ids: array<int>, n_tokens, n_docs)` — `n_tokens` counts
    * real (non-pad) ids, `n_docs` the documents contributing to the window.
    *
    * Scale shape — no token-level explode, no global sort bottleneck:
    *  1. global positions come from a TWO-PHASE prefix sum: range-partition
    *     by the order key, per-partition token subtotals (one bounded
    *     collect: #partitions rows), partition base offsets broadcast back,
    *     partition-LOCAL cumsum window. The plan is pinned with
    *     `localCheckpoint` so the offsets can't drift between the subtotal
    *     collect and the main pass.
    *  2. each document emits one row PER WINDOW IT TOUCHES (≈ len/W + 1)
    *     carrying an `array_slice` of its ids — the shuffle moves each id
    *     once, in array payloads, with (window, offset) routing keys.
    *  3. windows assemble with one groupBy: sort the (offset, slice) pairs,
    *     flatten, pad.
    * Determinism: the order key, offsets, and slices are pure functions of
    * (id, ids) — reruns and re-shards produce identical windows.
    */
  def packContextWindows(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      windowSize: Int,
      eosId: Int = 2,
      padId: Int = 0,
      orderKey: Option[org.apache.spark.sql.Column] = None,
  ): DataFrame = {
    require(windowSize > 0, "windowSize must be positive")
    val W = windowSize.toLong
    // default order = hash-of-id: a deterministic global shuffle, so each
    // window mixes unrelated documents (what the training stream wants);
    // pass e.g. `Some(col(idCol))` for corpus order, or a curriculum score
    // hash the RAW id column: a cast("long") here would turn non-numeric ids
    // into nulls, silently collapsing the order key (and the tie-break) into
    // nondeterminism instead of failing loudly
    val ord = orderKey.getOrElse(xxhash64(col(idCol)))
    // pin the (possibly expensive — BPE encode) input FIRST: without this,
    // repartitionByRange's range-sampling job evaluates the full upstream
    // plan once and the shuffle evaluates it AGAIN — the round-12 q132
    // diagnosis measured the encode running twice inside the pack. One
    // materialization; the sampler and the shuffle both read cheap arrays.
    val withEos = df.select(
      col(idCol).as("id"),
      concat(col(idsCol), array(lit(eosId))).as("ids"),
      ord.as("__h"),
    ).withColumn("__len", size(col("ids")).cast("long"))
      .localCheckpoint()
    // phase 1: global exclusive prefix sum of per-doc lengths.
    // Partition count scales with the TOKEN STREAM (cheap agg over the
    // pinned input), floored at the session parallelism — a fixed count
    // makes per-partition sort memory grow with N (the local-mode version
    // of "size your shuffle partitions for the target SF"); ~8M ids per
    // partition keeps each sort comfortably in executor memory.
    val totalTokens =
      withEos.agg(coalesce(sum(col("__len")), lit(0L))).collect()(0).getLong(0)
    val parts = math.max(
      math.max(1, df.sparkSession.sparkContext.defaultParallelism),
      (totalTokens / 8000000L).toInt)
    val parted = withEos
      .repartitionByRange(parts, col("__h"), col("id"))
      .sortWithinPartitions(col("__h"), col("id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin: subtotals and the main pass MUST see one plan
    val baseOf: Map[Int, Long] = {
      val subtotals = parted.groupBy(col("__pid")).agg(sum(col("__len")).as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val maxPid = if (subtotals.isEmpty) -1 else subtotals.keys.max
      (0 to maxPid).scanLeft(0L)((acc, p) => acc + subtotals.getOrElse(p, 0L))
        .zipWithIndex.map { case (base, p) => p -> base }.toMap
    }
    val baseExpr = baseOf.foldLeft(lit(0L)) { case (acc, (p, b)) =>
      when(col("__pid") === p, lit(b)).otherwise(acc)
    }
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"))
      .orderBy(col("__h"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = parted.withColumn("__off",
      baseExpr + coalesce(sum(col("__len")).over(wLocal), lit(0L)))
    // phase 2: one row per (doc, touched window) carrying the id slice
    // (`div` = integral division — `/` would be double math, which loses
    // exactness at 100 TB token-stream offsets)
    val slices = offsets
      .withColumn("__end", col("__off") + col("__len") - 1L)
      .withColumn("__w", explode(sequence(
        expr(s"__off div ${W}L"),
        expr(s"__end div ${W}L"))))
      .select(
        col("__w").as("window_id"),
        (greatest(col("__off"), col("__w") * W) - col("__w") * W).as("__pos"),
        slice(col("ids"),
          (greatest(col("__off"), col("__w") * W) - col("__off") + 1L).cast("int"),
          (least(col("__off") + col("__len"), (col("__w") + 1L) * W)
            - greatest(col("__off"), col("__w") * W)).cast("int")).as("__slice"),
      )
    // phase 3: assemble each window
    slices
      .groupBy(col("window_id"))
      .agg(
        flatten(array_sort(collect_list(struct(col("__pos"), col("__slice"))))
          .getField("__slice")).as("__ids"),
        count(lit(1)).as("n_docs"),
      )
      .select(
        col("window_id"),
        concat(col("__ids"),
          array_repeat(lit(padId), (lit(windowSize) - size(col("__ids"))).cast("int")))
          .as("ids"),
        size(col("__ids")).cast("long").as("n_tokens"),
        col("n_docs"),
      )
  }
}
