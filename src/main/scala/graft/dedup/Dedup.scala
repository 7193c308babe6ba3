package graft.dedup

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines (beyond-reference scope,
  * SURVEY.md §7 step 10): exact, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * Design rule for 100 TB: **candidate generation is always blocked/bucketed
  * — never all-pairs.** Every near-dup variant here shuffles by a bucket key
  * (LSH band, SimHash chunk, SRP bucket), compares only within buckets, and
  * caps pathological bucket sizes so one boilerplate cluster cannot go
  * quadratic.
  */
object Dedup {

  /** Exact dedup: keep one deterministic representative (min id) per
    * normalized-text group. Grouping key is the 128-bit fingerprint, not the
    * document body — shuffle rows stay tiny regardless of document size.
    * Collisions: md5 over normalized text makes false merges ~2^-64 at
    * corpus scale, the standard exact-dedup trade.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Exact dedup on explicit key columns (`dropDuplicates` with a
    * deterministic survivor instead of an arbitrary one).
    */
  def exactByKeys(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature (array<bigint> of length `numHashes`) over k-word
    * shingles. Each permutation is xxhash64(i, shingleHash) — integer-only,
    * codegen-friendly, no RNG state to broadcast.
    */
  def minHashSignature(text: Column, numHashes: Int = 128, shingleK: Int = 3): Column = {
    val sh = shingleHashes(text, shingleK)
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, h => xxhash64(i, h))),
    )
  }

  /** Near-duplicate PAIRS via banded MinHash-LSH:
    * shingle → minhash → `bands` band-buckets → shuffle on (band, bucket) →
    * candidate pairs within buckets only → exact-Jaccard verify.
    *
    * With numHashes=128, bands=32 (r=4), the S-curve midpoint is
    * (1/32)^(1/4) ≈ 0.42; pairs at `threshold` ≥ 0.7 are caught with
    * probability > 0.99.
    *
    * @param maxBucketSize drop degenerate buckets larger than this (boiler-
    *   plate clusters) instead of letting one bucket go quadratic.
    */
  def nearDupPairsMinHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      numHashes: Int = 128,
      bands: Int = 32,
      shingleK: Int = 3,
      maxBucketSize: Int = 1000,
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), shingleK).as("sh"),
    ).withColumn(
      "sig",
      transform(sequence(lit(0), lit(numHashes - 1)), i => array_min(transform(col("sh"), h => xxhash64(i, h)))),
    )
    // (id, band, bucket) — bucket = hash of the band's signature slice
    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b => xxhash64(lit(42), b, slice(col("sig"), b * r + 1, lit(r))))),
    ).toDF("id", "sh", "band", "bucket")
    verifyPairs(banded, threshold, maxBucketSize)
  }

  /** n-gram Jaccard near-dup: identical LSH pipeline but over character
    * n-gram sets — robust to word-boundary noise (whitespace mangling, OCR).
    */
  def nearDupPairsNgram(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      ngram: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucketSize: Int = 1000,
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      charNgramHashes(col(textCol), ngram).as("sh"),
    ).withColumn(
      "sig",
      transform(sequence(lit(0), lit(numHashes - 1)), i => array_min(transform(col("sh"), h => xxhash64(i, h)))),
    )
    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b => xxhash64(lit(42), b, slice(col("sig"), b * r + 1, lit(r))))),
    ).toDF("id", "sh", "band", "bucket")
    verifyPairs(banded, threshold, maxBucketSize)
  }

  /** Shared LSH tail: cap bucket sizes, self-join within (band, bucket),
    * dedup candidate pairs, verify exact Jaccard on the hashed sets.
    */
  private def verifyPairs(banded: DataFrame, threshold: Double, maxBucketSize: Int): DataFrame = {
    val capped = banded.withColumn(
      "__bsz", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))),
    ).where(col("__bsz") <= maxBucketSize).drop("__bsz")
    val a = capped.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Remove near-duplicates: connected candidates collapse onto the min-id
    * representative (single-hop union toward the smallest matched id — for
    * chains A~B~C where A≁C this keeps A and C, the standard one-pass
    * approximation; full transitive closure would need iterative
    * connected-components).
    */
  def dedupNear(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
  ): DataFrame = {
    val pairs  = nearDupPairsMinHash(df, idCol, textCol, threshold)
    val losers = pairs.select(col("id_b").as("__loser")).distinct()
    df.join(losers, col(idCol) === col("__loser"), "left_anti")
  }

  /** 64-bit SimHash over tokens: bit i is the sign of the token-hash-bit
    * vote. One projection — 64 integer aggregates per row, no shuffle.
    */
  def simHash(text: Column): Column = {
    val th = transform(tokens(normalizeText(text)), t => xxhash64(t))
    val bitCols: Seq[Column] = (0 until 64).map { i =>
      val vote = aggregate(
        th, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L),
      )
      when(vote >= 0L, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup pairs: pigeonhole blocking — split the 64-bit hash into
    * `maxHamming + 1` chunks; any pair within `maxHamming` bits shares at
    * least one exact chunk, so candidates come from chunk-equality joins
    * (never all-pairs), then verify popcount(xor) ≤ maxHamming.
    */
  def nearDupPairsSimHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 1000,
  ): DataFrame = {
    val chunks = maxHamming + 1
    val width  = 64 / chunks
    val withSim = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sim"))
    val blocked = withSim.select(
      col("id"), col("sim"),
      posexplode(array((0 until chunks).map { j =>
        shiftrightunsigned(col("sim"), j * width).bitwiseAND(lit((1L << width) - 1))
      }: _*)),
    ).toDF("id", "sim", "chunk", "val")
    val capped = blocked.withColumn(
      "__bsz", count(lit(1)).over(Window.partitionBy(col("chunk"), col("val"))),
    ).where(col("__bsz") <= maxBucketSize).drop("__bsz")
    val a = capped.select(col("chunk"), col("val"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = capped.select(col("chunk"), col("val"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk", "val"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", call_function("bit_count", col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding-cosine near-dup: SRP-LSH bucket join (multi-table for recall)
    * + exact cosine verify. Candidates only within equal buckets.
    */
  def nearDupPairsEmbedding(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      bits: Int = 12,
      tables: Int = 4,
      maxBucketSize: Int = 2000,
  ): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val bucketed = base.select(
      col("id"), col("vec"),
      posexplode(array((0 until tables).map(t => VectorFunctions.srpBucket(col("vec"), bits, seed = 42L + t)): _*)),
    ).toDF("id", "vec", "tbl", "bucket")
    val capped = bucketed.withColumn(
      "__bsz", count(lit(1)).over(Window.partitionBy(col("tbl"), col("bucket"))),
    ).where(col("__bsz") <= maxBucketSize).drop("__bsz")
    val a = capped.select(col("tbl"), col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = capped.select(col("tbl"), col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("tbl", "bucket"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
