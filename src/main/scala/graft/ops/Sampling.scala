package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines (builder's
  * brief, beyond-reference scope).
  *
  * Everything here derives randomness from a CONTENT HASH of a key column,
  * never from an RNG: the assignment of a row is a pure function of its key,
  * so it is (a) stable across reruns, engines, partitionings, and cluster
  * sizes — the property a 100 TB train/val/test split must have, or a
  * re-shard reassigns documents between splits; (b) mirrorable by the DuckDB
  * oracle. Each op is one narrow projection or one window — no extra shuffle
  * beyond what the semantics require.
  *
  * The hash → [0,1) trick avoids hex→int parsing entirely: the first 8 hex
  * chars of md5 are uniform, and for FIXED-LENGTH lowercase hex strings,
  * lexicographic order == numeric order. A fraction f maps to the hex
  * literal of floor(f·2³²); `substr(md5(key),1,8) < hexCut(f)` then keeps an
  * f-fraction of keys, with identical semantics in any engine that compares
  * ASCII strings bytewise.
  */
object Sampling {

  /** Lowercase 8-hex-char cut point for fraction `f` of the 32-bit space.
    * `f >= 1.0` returns the sentinel `"g"`, which compares greater than every
    * 8-hex bucket in any bytewise-ASCII engine ('g' > 'f') — a strict `<`
    * against `"ffffffff"` would silently drop keys whose bucket is exactly
    * `ffffffff` (~2.3e-10 of keys: real documents at 100 TB scale) from
    * groups whose contract is "keep everything".
    */
  private[graft] def hexCut(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction out of range: $f")
    if (f >= 1.0) "g"
    else f"${(f * 4294967296.0).toLong}%08x"
  }

  /** The stable per-row hash bucket: first 8 hex chars of md5(key). */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  /** Deterministic Bernoulli sample: keep a `fraction` of rows by key hash. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.where(hashBucket(col(keyCol)) < lit(hexCut(fraction)))

  /** Exact-N deterministic uniform sample: the N hash-smallest keys (ties
    * broken by the key itself). Unlike `sampleByHash` (fraction, size varies
    * by ±binomial noise) this returns EXACTLY n rows, and unlike a naive
    * global sort Spark executes orderBy+limit as a distributed TakeOrdered
    * (per-partition top-N, driver merges n·partitions candidates) — no full
    * sort, no single-partition window. Same rows on any partitioning/rerun.
    */
  def sampleExact(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    df.orderBy(hashBucket(col(keyCol)), col(keyCol)).limit(n)
  }

  /** Deterministic weighted sample WITHOUT replacement, exactly n rows —
    * Efraimidis–Spirakis A-ES (IPL 2006): each row ranks by u^(1/w) for a
    * uniform u, and the top-n ranks are a weight-proportional sample without
    * replacement. The uniform comes from the row's key hash
    * ((md5_32(key) + 0.5) / 2³²), not an RNG, so the same rows are chosen on
    * any partitioning, rerun, or cluster size — the property every other
    * sampler in this file guarantees. Rows with null/non-positive weight are
    * excluded (a zero-weight row must never be sampled; a negative weight is
    * meaningless in A-ES).
    *
    * Scale: orderBy+limit executes as distributed TakeOrdered (per-partition
    * top-n, driver merges n·partitions candidates) — no full sort, no
    * single-partition window, same shape as [[sampleExact]].
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .orderBy(aesRank(keyCol, weightCol).desc, col(keyCol))
      .limit(n)
  }

  /** The A-ES rank u^(1/w) with the deterministic md5-derived uniform —
    * shared by [[weightedSample]], [[weightedSamplePerGroup]], and the
    * streaming reservoir ([[graft.streaming.StreamingSample]], which needs
    * the rank to prove merge-closure in its spec).
    */
  private[graft] def aesRank(keyCol: String, weightCol: String): Column = {
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    pow(u, lit(1.0) / col(weightCol).cast("double"))
  }

  /** Stratified [[weightedSample]]: exactly `nPerGroup` rows per group (or
    * the whole group when smaller), weight-proportional within each group,
    * deterministic. One shuffle by group + per-group sort for the
    * `row_number` rank — the standard stratified-sample shape; groups
    * partition across executors, no global sort.
    */
  def weightedSamplePerGroup(
      df: DataFrame, groupCol: String, keyCol: String, weightCol: String,
      nPerGroup: Int): DataFrame = {
    require(nPerGroup >= 1, "nPerGroup must be >= 1")
    val w = Window.partitionBy(col(groupCol)).orderBy(aesRank(keyCol, weightCol).desc, col(keyCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__aes_rn", row_number().over(w))
      .where(col("__aes_rn") <= nPerGroup)
      .drop("__aes_rn")
  }

  /** Deterministic train/val/test-style split assignment. `cuts` are
    * (name, cumulativeUpperFraction) pairs in ascending order; the last
    * name catches the remainder. E.g.
    * `Seq("train" -> 0.8, "val" -> 0.9, "test" -> 1.0)`.
    */
  def hashSplit(df: DataFrame, keyCol: String, cuts: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(cuts.nonEmpty, "cuts must be non-empty")
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must be ascending")
    val h = hashBucket(col(keyCol))
    val assigned = cuts.init.foldRight(lit(cuts.last._1)) { case ((name, hi), acc) =>
      when(h < lit(hexCut(hi)), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Deterministic per-group sample of `n` rows: rank rows within each group
    * by key hash (tie-broken by the key itself) and keep the first `n` —
    * the scalable stand-in for per-source reservoir sampling. One shuffle by
    * group key; the window never buffers more than a partition's rows.
    */
  def sampleByGroup(df: DataFrame, groupCols: Seq[String], keyCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hashBucket(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n).drop("__rn")
  }

  /** Deterministic epoch shuffle for training readers: a per-epoch
    * pseudo-random permutation key plus a shard label, WITHOUT a Spark
    * shuffle — one narrow projection. `shuffle_key = md5(key ":" epoch)`
    * gives every epoch an independent ordering (the training loader sorts
    * within shard by it); `shard` = first `shardChars` hex chars of the key
    * (16^shardChars shards) lets 16^shardChars readers consume the corpus
    * independently with no coordination. Pure function of (key, epoch):
    * re-runs, re-shards, and engine swaps reproduce the exact epoch order.
    * A null key propagates to a null shuffle_key/shard (concat, not
    * concat_ws — the skip-nulls variant would silently pile every null-key
    * row onto one identical position).
    */
  def epochShard(
      df: DataFrame,
      keyCol: String,
      epoch: Int,
      shardChars: Int = 2,
      keyOut: String = "shuffle_key",
      shardOut: String = "shard",
  ): DataFrame = {
    require(shardChars >= 1 && shardChars <= 8, s"shardChars out of range: $shardChars")
    df.withColumn(keyOut, md5(concat(col(keyCol).cast("string"), lit(":"), lit(epoch.toString))))
      .withColumn(shardOut, substring(col(keyOut), 1, shardChars))
  }

  /** Deterministic source-mixture sampling: keep a per-group fraction of
    * rows — the "re-weight corpus sources toward a target data mixture"
    * op of a training pipeline. The fractions map is bounded config (one
    * entry per source), embedded in the plan as a CASE chain: no join, no
    * shuffle, one filter that composes with scan pushdown. Groups absent
    * from the map keep `defaultFraction`. Same stability contract as
    * [[sampleByHash]]: membership is a pure function of the key.
    */
  def mixture(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0,
  ): DataFrame = {
    val cut = fractions.foldLeft(lit(hexCut(defaultFraction))) { case (acc, (g, f)) =>
      when(col(groupCol) === g, lit(hexCut(f))).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol)) < cut)
  }

  /** Epoch-aware source mixture: each group's rows repeat `epochs(g)` times —
    * `floor(e)` full copies plus one extra copy for a deterministic
    * hash-selected `e − floor(e)` fraction of rows. The multi-epoch
    * data-recipe op (LLaMA-style: high-quality sources run >1 epoch, bulk
    * crawl <1); [[mixture]] is the `e <= 1` special case. Output adds an
    * `epoch` column (0-based copy index) so the downstream training
    * shuffle can interleave copies instead of replaying them back-to-back.
    *
    * The fractional-copy hash salts the key with "#epoch" so membership is
    * independent of [[mixture]]/[[hashSplit]] cuts on the same key.
    *
    * Scale shape: pure projection + one Generate (explode of a ≤⌈e⌉-long
    * sequence) — no shuffle; multiplied rows flow straight into the
    * downstream shard write. Row-count amplification is exactly the recipe
    * Σ n_g·e_g, decided per row at scan speed.
    */
  def epochMixture(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      epochs: Map[String, Double],
      defaultEpochs: Double = 1.0,
  ): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 1000.0),
      "epochs must be in [0, 1000]")
    def fracOf(e: Double) = e - math.floor(e)
    val whole = epochs.foldLeft(lit(math.floor(defaultEpochs).toLong)) { case (acc, (g, e)) =>
      when(col(groupCol) === g, lit(math.floor(e).toLong)).otherwise(acc)
    }
    val cut = epochs.foldLeft(lit(hexCut(fracOf(defaultEpochs)))) { case (acc, (g, e)) =>
      when(col(groupCol) === g, lit(hexCut(fracOf(e)))).otherwise(acc)
    }
    val extra =
      when(hashBucket(concat(col(keyCol).cast("string"), lit("#epoch"))) < cut, 1L).otherwise(0L)
    df.withColumn("__copies", whole + extra)
      .where(col("__copies") >= 1L)
      .select(df.columns.map(col) :+
        explode(sequence(lit(0L), col("__copies") - 1L)).as("epoch"): _*)
  }

  /** Deterministic token-budget mixture: admit rows per group, in stable
    * hash order, while the running token sum (including the current row)
    * stays within the group's budget — the "fill a 50 B-token mix with
    * X tokens of code, Y of encyclopedia, …" op of a training pipeline,
    * where targets are token counts, not fractions ([[mixture]]) or row
    * counts ([[sampleByGroup]]). Groups absent from the map get
    * `defaultBudget` (unlimited by default).
    *
    * Scale shape: one shuffle on the group key plus a running-sum window.
    * Order payload-free projections into the window (id, group, tokens)
    * and semi-join survivors back if rows are wide; a mega-group's window
    * is a single-task sort — the same per-group skew bound as every
    * grouped window here, acceptable because groups are SOURCES (dozens
    * to thousands), not keys. Admission is a pure function of
    * (key, group, token column), so re-runs and engine swaps reproduce
    * the exact member set.
    */
  /** Temperature-based mixture rebalancing (the multilingual-sampling rule
    * of XLM-R / mT5): target shares q_g ∝ p_g^alpha flatten the group
    * distribution for alpha < 1. Realized as the largest feasible
    * downsample — the most-boosted (smallest) group keeps 100% and every
    * other group keeps `rate_g = p_g^(alpha-1) / max_h p_h^(alpha-1)`
    * (the q/p ratio normalized so no rate exceeds 1; the normalizing
    * Σp^alpha cancels, which matters because a sum's float value would
    * depend on summation order and break engine parity).
    *
    * Rates are rounded to `precision` decimals so the oracle's libm and
    * the JVM's may differ in the last ulp of `pow` without changing
    * membership. Group counts are one aggregate collected to the driver —
    * bounded config (groups are languages/sources), embedded as a CASE
    * chain exactly like [[mixture]]: no join, no shuffle at apply time,
    * membership a pure function of the key.
    */
  def temperatureMixture(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      alpha: Double,
      precision: Int = 6,
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureMixture on an empty dataframe")
    val total = counts.values.sum.toDouble
    val wts   = counts.map { case (g, n) => g -> math.pow(n / total, alpha - 1.0) }
    val maxW  = wts.values.max
    val rates = wts.map { case (g, w) =>
      g -> BigDecimal(w / maxW)
        .setScale(precision, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    mixture(df, groupCol, keyCol, rates, defaultFraction = 1.0)
  }

  def tokenBudget(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      tokenCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue,
  ): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(keyCol)), col(keyCol))
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .where(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Mixture waterfill: split a TOTAL token budget across groups toward a
    * target mixture, respecting per-group availability — the planning step
    * that produces the per-group budgets [[tokenBudget]] then enforces.
    *
    * Semantics: allocate `alloc_g = min(avail_g, weight_g·t / Σweights)`
    * with the water level `t` chosen so Σ alloc = min(budget, Σ avail) —
    * groups too small for their target share saturate at availability and
    * their surplus budget redistributes to the rest proportionally
    * (classic waterfilling). Weights are RELATIVE INTEGERS ("5 parts en,
    * 2 parts zh"); groups absent from the map get weight 0 → alloc 0.
    *
    * Closed form, no iteration: sort groups by `avail/weight` ascending —
    * saturation happens in exactly that order — and compute for each group
    * the level-if-the-water-stops-here from exact-integer prefix sums:
    * `lvl_g = (budget − cumAvail_prev)·Σw / (Σw − cumWeight_prev)`. The
    * first group whose ratio exceeds its level is where saturation stops;
    * within that failing suffix `lvl` is strictly decreasing, so
    * `t = max(lvl over failing groups)` (NULL ⇒ everything fits; alloc =
    * avail). Every floating-point value is a single mult-then-div over
    * exact BIGINT prefix sums — no accumulation-order sensitivity, so the
    * DuckDB oracle reproduces each double bit-for-bit.
    *
    * Scale: one shuffle for the per-group aggregate, then a single-
    * partition window over G rows — G is the number of DOMAINS (mixture
    * arms), thousands at most, never O(data).
    */
  def budgetWaterfill(
      df: DataFrame,
      groupCol: String,
      tokenCol: String,
      weights: Map[String, Long],
      totalBudget: Long): DataFrame = {
    require(totalBudget >= 0, "totalBudget must be >= 0")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val sumWi = weights.values.sum
    require(sumWi > 0, "at least one positive weight required")
    val sumWd = sumWi.toDouble
    // null token counts contribute no budgetable tokens; dropping them up
    // front keeps `avail` non-null (a null avail would poison the ratio
    // ordering and the prefix sums with SQL-null arithmetic)
    val avail = df.where(col(tokenCol).isNotNull).groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).cast("long").as("avail"))
    val wtExpr = weights.foldLeft(lit(0L)) { case (acc, (g, wt)) =>
      when(col(groupCol) === g, lit(wt)).otherwise(acc)
    }
    val maxD = Double.MaxValue
    val base = avail.withColumn("weight", wtExpr)
      .withColumn("__ratio",
        when(col("weight") > 0,
          col("avail").cast("double") * lit(sumWd) / col("weight").cast("double"))
          .otherwise(lit(maxD)))
    val prev = Window.orderBy(col("__ratio"), col(groupCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val staged = base
      .withColumn("__cumA", coalesce(sum(col("avail")).over(prev), lit(0L)))
      .withColumn("__cumW", coalesce(sum(col("weight")).over(prev), lit(0L)))
      .withColumn("__lvl",
        when(col("weight") > 0,
          (lit(totalBudget) - col("__cumA")).cast("double") * lit(sumWd) /
            (lit(sumWi) - col("__cumW")).cast("double")))
    val tStar = staged
      .where(col("weight") > 0 && col("__ratio") > col("__lvl"))
      .agg(max(col("__lvl")).as("__t"))
    staged.crossJoin(broadcast(tStar))
      .withColumn("alloc",
        // weight 0 → alloc 0 UNCONDITIONALLY: the null-tStar ("everything
        // fits") branch must not hand unweighted groups their availability —
        // that would both break the documented contract and let the total
        // allocation exceed totalBudget (only WEIGHTED avail is known to fit)
        when(col("weight") === 0, lit(0L))
          .when(col("__t").isNull, col("avail"))
          .otherwise(
            least(col("avail"),
              floor(col("weight").cast("double") * col("__t") / lit(sumWd)).cast("long"))))
      .select(col(groupCol), col("avail"), col("weight"), col("alloc"))
  }
}
