package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) as codegen'd
  * native expressions.
  *
  * The embedding is split into `m` contiguous subspaces of `dsub` dims; each
  * subspace is vector-quantized against its own `k`-entry codebook, so a
  * d-dim float vector (4·d bytes) stores as `m` bytes — 32× compression at
  * d=64, m=8. Search is ADC (asymmetric distance computation): the query
  * stays exact, each query precomputes an m×k lookup table of
  * subspace dot products, and a corpus row's score is m table lookups — no
  * float math per row beyond additions.
  *
  * Cosine convention: vectors are L2-NORMALIZED INSIDE encode/LUT, so the
  * ADC score approximates cosine similarity directly (dot of unit vectors).
  *
  * All three kernels are single tree nodes whose `doGenCode` emits one
  * static call — the codebook rides as a reference object (one copy per
  * task), never serialized per row.
  */
object PqImpl {

  /** Normalized copy of `vec` as a double array (zero vector passes
    * through unnormalized — its dot with anything is 0 anyway).
    */
  private def normalized(vec: ArrayData, dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    val n = math.min(dim, vec.numElements())
    var i = 0
    var ss = 0.0
    while (i < n) { v(i) = vec.getFloat(i).toDouble; ss += v(i) * v(i); i += 1 }
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** PQ codes of `vec` — m bytes, code j = argmin_c ||x_j − codebook(j,c)||²
    * (ties to the lowest code, for cross-run determinism).
    */
  def encode(vec: ArrayData, m: Int, k: Int, dsub: Int, flat: Array[Float]): Array[Byte] = {
    val v     = normalized(vec, m * dsub)
    val codes = new Array[Byte](m)
    var j     = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cb = (j * k + c) * dsub
        var d  = 0.0
        var t  = 0
        while (t < dsub) {
          val diff = v(base + t) - flat(cb + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }

  /** ADC lookup table for a query: float[m·k], entry (j,c) = dot of the
    * query's j-th normalized subvector with codebook entry (j,c).
    */
  def lut(q: ArrayData, m: Int, k: Int, dsub: Int, flat: Array[Float]): ArrayData = {
    val v   = normalized(q, m * dsub)
    val out = new Array[Float](m * k)
    var j   = 0
    while (j < m) {
      val base = j * dsub
      var c    = 0
      while (c < k) {
        val cb  = (j * k + c) * dsub
        var dot = 0.0
        var t   = 0
        while (t < dsub) { dot += v(base + t) * flat(cb + t); t += 1 }
        out(j * k + c) = dot.toFloat
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_j lut(j, codes[j]) — double accumulation. */
  def adc(codes: Array[Byte], lut: ArrayData, k: Int): Double = {
    var acc = 0.0
    var j   = 0
    while (j < codes.length) {
      acc += lut.getFloat(j * k + (codes(j) & 0xFF))
      j += 1
    }
    acc
  }
}

/** PQ-encode a float vector to m bytes — see [[PqImpl.encode]]. */
case class PqEncodeExpr(child: Expression, m: Int, k: Int, dsub: Int, flat: Array[Float])
    extends GraftUnaryCodegen {
  require(k >= 1 && k <= 256, "PQ codebook size must be 1..256 (codes are bytes)")
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any =
    PqImpl.encode(input.asInstanceOf[ArrayData], m, k, dsub, flat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", flat, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqImpl.encode($c, $m, $k, $dsub, $ref)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Per-query ADC lookup table — see [[PqImpl.lut]]. */
case class PqLutExpr(child: Expression, m: Int, k: Int, dsub: Int, flat: Array[Float])
    extends GraftUnaryCodegen {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    PqImpl.lut(input.asInstanceOf[ArrayData], m, k, dsub, flat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", flat, "float[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqImpl.lut($c, $m, $k, $dsub, $ref)")
  }
  override protected def staticCall(c: String): String =
    throw new IllegalStateException("doGenCode overridden")
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** ADC score of (codes, lut) — see [[PqImpl.adc]]. */
case class AdcScoreExpr(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(codes: Any, lutv: Any): Any =
    PqImpl.adc(codes.asInstanceOf[Array[Byte]], lutv.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.PqImpl.adc($c, $l, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScoreExpr =
    copy(left = newLeft, right = newRight)
}
