package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns (beyond-reference
  * scope — SURVEY.md §7 step 10). Backed by native codegen'd Catalyst
  * expressions ([[HashImpl]]) — one tight JVM loop per row, double
  * accumulation left-to-right for cross-engine (DuckDB oracle) determinism.
  * Round 2 composed these from `zip_with`/`aggregate` higher-order functions,
  * which evaluate interpreted per row — the native versions keep the
  * surrounding projection in whole-stage codegen.
  */
object VectorFunctions {

  /** Dot product, accumulated in double (left-to-right, deterministic). */
  def dot(a: Column, b: Column): Column = NativeFunctions.dot(a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity ∈ [-1,1]; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = NativeFunctions.cosine(a, b)

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column = NativeFunctions.sqDist(a, b)

  /** Random-hyperplane (sign) LSH bucket id: `bits` sign-bits of projections
    * onto deterministic pseudo-random hyperplanes, packed into a long.
    *
    * The hyperplanes derive from a seeded splitmix64 mix (no RNG state, no
    * broadcast weight matrix): plane i, dimension j has weight in {-1, +1}.
    * Sign-random projections need only ±1 weights for LSH locality
    * (Charikar 2002 SimHash / SRP).
    *
    * Same bucket ⇒ likely-similar; used to block candidate generation so
    * similarity joins never go all-pairs (SURVEY.md brief: the scale path).
    */
  def srpBucket(v: Column, bits: Int = 16, seed: Long = 42L): Column = {
    require(bits >= 1 && bits <= 63, "bits must be in [1,63]")
    NativeFunctions.srpBucket(v, bits, seed)
  }
}
