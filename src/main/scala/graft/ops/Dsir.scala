package graft.ops

import graft.functions.{GraftUnaryCodegen, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** DSIR-style importance weighting (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023): score every
  * raw document by how much its hashed-n-gram distribution looks like a
  * TARGET corpus, `logw(d) = Σ_grams log2 p_target(bucket) − log2
  * p_raw(bucket)` with add-one smoothing over 256 md5-byte buckets.
  * Downstream selection is then a deterministic top-fraction /
  * Gumbel-style resample over `logw` — this op produces the scores.
  *
  * Engine-parity design (what makes the DuckDB oracle possible): every
  * per-bucket log ratio is rounded to an INTEGER number of micro-log2
  * units (`round(log2(x)·10⁶)`, non-negative inputs so every rounding
  * mode agrees), and a document's weight is an exact integer sum of those
  * units — no float accumulation whose value depends on summation order.
  * The only floats are one `ln` per bucket (differences beyond 1 µlog2
  * cannot flip the rounded value) and one final division by 10⁶.
  *
  * Scale shape: two aggregate passes build the 256-bucket histograms
  * (map-side combine; 256 rows collected — bounded config, same policy as
  * centroids), then scoring is a single codegen'd scan: the per-doc gram
  * loop runs inside [[DsirWeightExpr]] with the ratio table shipped as a
  * 2 KiB reference object. No explode, no join, no shuffle in the scoring
  * pass — at 100 TB the corpus is read twice and exchanged never.
  */
object Dsir {

  def importanceWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 2,
  ): DataFrame = {
    def bucketCounts(df: DataFrame): Map[Int, Long] =
      df.select(explode(TextFunctions.wordShingles(col(textCol), k)).as("gram"))
        .select(substring(md5(col("gram")), 1, 2).as("bk"))
        .groupBy("bk").agg(count(lit(1)).as("n"))
        .collect().map(r => Integer.parseInt(r.getString(0), 16) -> r.getLong(1)).toMap
    score(raw, idCol, textCol, k, bucketCounts(raw), bucketCounts(target))
  }

  /** [[importanceWeights]] for the common production case where the target
    * corpus IS a predicate over the raw corpus (q108/q184's shape,
    * `target = raw.filter(cond)`): BOTH 256-bucket histograms come out of
    * ONE gram scan — `count(*)` plus a conditional count per bucket — so
    * the fit reads the corpus once instead of twice (the fit scans
    * dominate the op's 4.2×/decade slope; this removes the larger one).
    * Output is bit-identical to `importanceWeights(raw, raw.filter(cond))`:
    * the conditional count equals the filtered count (NULL predicate rows
    * count as false, exactly as `filter` drops them), and the scoring tail
    * is the shared [[score]].
    */
  def importanceWeightsFiltered(
      raw: DataFrame,
      targetCond: Column,
      idCol: String,
      textCol: String,
      k: Int = 2,
  ): DataFrame = {
    val counts = raw
      .select(targetCond.cast("boolean").as("__t"),
        explode(TextFunctions.wordShingles(col(textCol), k)).as("gram"))
      .select(col("__t"), substring(md5(col("gram")), 1, 2).as("bk"))
      .groupBy("bk")
      .agg(count(lit(1)).as("rn"), count(when(col("__t"), lit(1))).as("tn"))
      .collect().map(r => (Integer.parseInt(r.getString(0), 16), r.getLong(1), r.getLong(2)))
    score(raw, idCol, textCol, k,
      counts.map(c => c._1 -> c._2).toMap,
      counts.filter(_._3 > 0).map(c => c._1 -> c._3).toMap)
  }

  /** The shared scoring tail: ratio table + normalizer from the two
    * histograms, then the single codegen'd scan.
    */
  private def score(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      rawC: Map[Int, Long],
      tgtC: Map[Int, Long],
  ): DataFrame = {
    val rTot = rawC.values.sum
    val tTot = tgtC.values.sum
    // micro-log2 units; x >= 1 always, so the value rounded is non-negative
    // and every engine's round-half convention agrees
    def L(x: Long): Long = Math.round(Math.log(x.toDouble) / Math.log(2.0) * 1e6)
    val ratios = Array.tabulate(256) { b =>
      L(tgtC.getOrElse(b, 0L) + 1) - L(rawC.getOrElse(b, 0L) + 1)
    }
    // per-gram normalizer: −log2(T+B) + log2(R+B), B = 256 buckets
    val cInt = L(rTot + 256) - L(tTot + 256)

    val g = TextFunctions.wordShingles(col(textCol), k)
    raw.select(col(idCol),
      size(g).cast("long").as("n_grams"),
      ((ColumnBridge.column(DsirWeightExpr(ColumnBridge.expression(g), ratios))
        + size(g).cast("long") * lit(cInt)) / lit(1e6)).as("logw"))
  }

  /** DSIR's SELECTION step (the "Gumbel-style resample" the scoring
    * scaladoc defers to), deterministic: top-`n` rows by
    * `logw·ln2/τ + Gumbel(u(id))`, with `u` the md5-derived content
    * uniform shared with the A-ES sampler ([[Sampling.weightedSample]]).
    * By the Gumbel-top-k identity this IS sampling without replacement
    * with probability ∝ w^(1/τ) (logw is in log2 units, hence the ln 2
    * factor) — Xie et al.'s importance resampling — yet restart-stable,
    * replay-idempotent, and declaratively replayable by the oracle.
    * τ → 0 degrades toward hard top-n by weight; τ = 1 is the paper's
    * draw. `exp(logw)` never materializes, so weights of any magnitude
    * are numerically safe. Executes as a distributed TakeOrdered
    * (per-partition top-n, driver merges n·partitions candidates — no
    * global sort); ties break by id ascending.
    */
  def resample(
      scored: DataFrame,
      idCol: String,
      logwCol: String,
      n: Int,
      tau: Double = 1.0,
  ): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(tau > 0.0, "tau must be positive")
    // withColumn REPLACES an identically-named column — a caller's
    // preexisting gumbel_key would be silently overwritten (the repo-wide
    // __-internal convention can't help here because gumbel_key IS the
    // documented output column), so fail loudly instead
    require(!scored.columns.contains("gumbel_key"),
      "input frame already carries a gumbel_key column; rename it before resample")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("double") +
      lit(0.5)) / lit(4294967296.0)
    scored
      .withColumn("gumbel_key", col(logwCol) * lit(math.log(2.0) / tau) - log(-log(u)))
      .orderBy(desc("gumbel_key"), col(idCol))
      .limit(n)
  }
}

object DsirImpl {
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Σ over grams of `ratios[first md5 byte]` — exact integer arithmetic. */
  def weight(grams: ArrayData, ratios: Array[Long]): Long = {
    val md  = md5Local.get()
    var acc = 0L
    var i   = 0
    val n   = grams.numElements()
    while (i < n) {
      md.reset()
      val d = md.digest(grams.getUTF8String(i).getBytes)
      acc += ratios(d(0) & 0xff)
      i += 1
    }
    acc
  }
}

/** Per-document DSIR weight in micro-log2 units as a single codegen'd tree
  * node over the gram array; the 256-entry ratio table rides along as a
  * reference object (one copy per task, not per row).
  */
case class DsirWeightExpr(child: Expression, ratios: Array[Long]) extends GraftUnaryCodegen {
  require(ratios.length == 256, "ratio table must cover the 256 md5-byte buckets")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    DsirImpl.weight(input.asInstanceOf[ArrayData], ratios)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirRatios", ratios, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.ops.DsirImpl.weight($c, $ref)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): DsirWeightExpr =
    copy(child = newChild)
}
