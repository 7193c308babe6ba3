package graft.ops

import graft.functions.GraftUnaryCodegen
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Multi-dimensional data layout: Z-ORDER clustering (Morton curve), the
  * lakehouse `OPTIMIZE ZORDER BY` analog. A table sorted by one column
  * gives perfect min/max file skipping on that column and none on any
  * other; writing in z-value order gives every clustered dimension NARROW
  * per-file min/max ranges simultaneously, so parquet row-group stats
  * prune scans filtered on ANY of them.
  *
  * Scale shape: bucketing is a scan-speed projection (uniform math or a
  * binary search against broadcast quantile boundaries), the z-value is
  * plain codegen'd bit arithmetic, and the clustered write is ONE
  * `repartitionByRange` on z (sampled range exchange — no global sort) +
  * `sortWithinPartitions`. Cost is the rewrite you were already paying in
  * a compaction pass; skipping benefits apply to every later scan.
  */
object Layout {

  /** `value → [0, 2^bits)` uniform bucket given fixed [min, max) bounds —
    * the closed-form dial (engine-portable; use [[quantileBuckets]] for
    * skewed columns). Out-of-range values clamp.
    */
  def uniformBucket(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, "max must exceed min")
    require(bits >= 1 && bits <= 20, "bits must be 1..20")
    val n = (1 << bits).toDouble
    // clamp in DOUBLE space BEFORE the int cast: an out-of-range value far
    // above `max` (e.g. a key offset by a 10x fixture replication) makes
    // the raw floor exceed Int range, and ANSI mode then throws
    // CAST_OVERFLOW instead of clamping (found by the sf10 sweep, q157)
    least(lit(((1 << bits) - 1).toDouble),
      greatest(lit(0.0), floor((c.cast("double") - min) * n / (max - min))))
      .cast("int")
  }

  /** Quantile bucketing for arbitrary distributions: boundaries from
    * `approxQuantile` (one sampled pass, 2^bits−1 split points broadcast as
    * a reference object), mapping via binary search in a codegen'd
    * expression. Buckets are then near-equi-populated regardless of skew —
    * the property the z-curve needs to cluster usefully.
    */
  def quantileBuckets(df: DataFrame, colName: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, "bits must be 1..16")
    val k = 1 << bits
    val probs = (1 until k).map(_.toDouble / k).toArray
    val bounds = df.stat.approxQuantile(colName, probs, 0.001)
    ColumnBridge.column(BucketOfExpr(
      ColumnBridge.expression(col(colName).cast("double")), bounds))
  }

  /** Morton z-value of per-dimension buckets: bit i of bucket j lands at
    * position `i·n + (n−1−j)` (dimension 0 owns the most significant
    * position of each group). Pure codegen'd bit arithmetic.
    */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "need at least one dimension")
    require(bits * buckets.size <= 62, "z-value must fit a long")
    val n = buckets.size
    var z: Column = lit(0L)
    for (i <- 0 until bits; (b, j) <- buckets.zipWithIndex) {
      val bit = shiftright(b.cast("long"), i).bitwiseAND(lit(1L))
      z = z.bitwiseOR(shiftleft(bit, i * n + (n - 1 - j)))
    }
    z
  }

  /** Cluster `df` in z-order over `zCol` into ~`numFiles` output slices:
    * range exchange on z + partition-local sort. Write the result with any
    * sink; each emitted file then covers a compact z-range ⇒ narrow min/max
    * on every clustered dimension (asserted quantitatively in LayoutSpec).
    */
  def clusterByZ(df: DataFrame, zCol: Column, numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    df.withColumn("__z", zCol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}

object LayoutImpl {
  /** Index of the first boundary > v (binary search) — the bucket id. */
  def bucketOf(v: Double, bounds: Array[Double]): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= bounds(mid)) hi = mid else lo = mid + 1
    }
    lo
  }
}

/** Quantile-boundary bucket id as a single codegen'd tree node; the
  * boundary table rides as a reference object.
  */
case class BucketOfExpr(child: Expression, bounds: Array[Double]) extends GraftUnaryCodegen {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    LayoutImpl.bucketOf(input.asInstanceOf[Double], bounds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zBounds", bounds, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.ops.LayoutImpl.bucketOf($c, $ref)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): BucketOfExpr =
    copy(child = newChild)
}
