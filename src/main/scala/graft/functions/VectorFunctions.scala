package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns (beyond-reference
  * scope — SURVEY.md §7 step 10). Built from `zip_with`/`aggregate`
  * higher-order functions: JVM-native per-row evaluation, no UDF
  * serialization, accumulation in double for cross-engine determinism.
  */
object VectorFunctions {

  /** Dot product, accumulated in double (left-to-right, deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v,
    )

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity ∈ [-1,1]; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v,
    )

  /** Random-hyperplane (sign) LSH bucket id: `bits` sign-bits of projections
    * onto deterministic pseudo-random hyperplanes, packed into a long.
    *
    * The hyperplanes derive from a seeded hash (no RNG state, no broadcast
    * weight matrix): plane i, dimension j has weight in {-1, +1} from
    * xxhash64-style integer mixing of (seed, i, j). Sign-random projections
    * need only ±1 weights for LSH locality (Charikar 2002 SimHash/ SRP).
    *
    * Same bucket ⇒ likely-similar; used to block candidate generation so
    * similarity joins never go all-pairs (SURVEY.md brief: the scale path).
    */
  def srpBucket(v: Column, bits: Int = 16, seed: Long = 42L): Column = {
    require(bits >= 1 && bits <= 63, "bits must be in [1,63]")
    val projections: Seq[Column] = (0 until bits).map { i =>
      // weight(i,j) = ±1 from a splitmix64-ish mix of (seed, i, j)
      val weighted = zip_with(
        v,
        sequence(lit(0), size(v) - 1),
        (x, j) => {
          val h = hash(lit(seed), lit(i), j) // 32-bit Murmur3, deterministic
          when(h.bitwiseAND(lit(1)) === 1, x.cast("double")).otherwise(-x.cast("double"))
        },
      )
      aggregate(weighted, lit(0.0), (acc, x) => acc + x)
    }
    projections.zipWithIndex.map { case (p, i) =>
      when(p >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
