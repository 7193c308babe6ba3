package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the scoring
  * rule behind LASER/CCMatrix parallel-corpus mining): for a source
  * sentence x and target candidate y, score
  *
  *   margin(x, y) = cos(x, y) / ( Σ_{z∈NN_k(x)} cos(x, z) / (2k)
  *                              + Σ_{z∈NN_k(y)} cos(y, z) / (2k) )
  *
  * — raw cosine normalized by both sides' neighborhood density, which is
  * what separates true translations from "hub" sentences that are merely
  * close to everything. The training-data use: mine aligned pairs out of
  * two monolingual embedded corpora (beyond-reference scope, builder's
  * brief).
  *
  * Scale shape: candidate search is the kNN primitive — the exact
  * broadcast pass here ([[Ann.bruteForceTopK]], bounded query batches) or
  * [[Ann.knnJoin]] at constant cell size for corpus × corpus mining (the
  * bench twin). The margin arithmetic is bounded per row: each normalizer
  * folds exactly k cosines in (rank) order — deterministic under any
  * partitioning, hence oracle-replayable — and the y-side normalizer is
  * computed ONLY for the ≤ |X|·k distinct candidates, never all of Y.
  */
object Bitext {

  /** Fold a per-query neighbor list into Σcos/(2k), in rank order. */
  private def degree(nn: DataFrame, k: Int, idOut: String, degOut: String): DataFrame =
    nn.groupBy(col("query_id").as(idOut))
      .agg((aggregate(
        array_sort(collect_list(struct(col("rank").as("r"), col("cosine").as("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")) / lit(2.0 * k)).as(degOut))

  /** Mine the best target candidate per source row, margin-scored.
    *
    * @param xQueries source rows (xId, xVec) — a bounded query batch (the
    *                 exact dial; mine the full corpus in slices, or use
    *                 the knnJoin twin)
    * @param yCorpus  target-language corpus (yId, yVec)
    * @param xCorpus  source-language corpus (xId, xVec) — the y-side
    *                 normalizer's neighborhood; usually the corpus
    *                 `xQueries` was sliced from
    * @param k        neighborhood size for both normalizers and the
    *                 candidate pool
    * Output: (x_id, y_id, cosine, margin) — the argmax-margin candidate
    * per source row, ties broken by (margin DESC, y_id ASC).
    */
  def marginScores(
      xQueries: DataFrame,
      yCorpus: DataFrame,
      xCorpus: DataFrame,
      xId: String,
      xVec: String,
      yId: String,
      yVec: String,
      k: Int = 4,
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // forward kNN: per x, the k candidate ys (cosines ride along)
    val nnXY = Ann.bruteForceTopK(yCorpus, xQueries, yId, yVec, xId, xVec, k)
    // y-side normalizer for the DISTINCT candidates only (≤ |X|·k rows):
    // each candidate y's own kNN inside the SOURCE-language corpus
    val candY = nnXY.select(col("neighbor_id").as("__yq")).distinct()
      .join(yCorpus.select(col(yId).as("__yq"), col(yVec).as("__yv")), Seq("__yq"))
    val nnYX = Ann.bruteForceTopK(xCorpus, candY, xId, xVec, "__yq", "__yv", k)
    marginFromNN(nnXY, nnYX, k)
  }

  private def marginFromNN(nnXY: DataFrame, nnYX: DataFrame, k: Int): DataFrame = {
    val degX = degree(nnXY, k, "x_id", "__degx")
    val degY = degree(nnYX, k, "y_id", "__degy")
    nnXY.select(col("query_id").as("x_id"), col("neighbor_id").as("y_id"),
        col("cosine"))
      .join(degX, Seq("x_id"))
      .join(degY, Seq("y_id"))
      .select(col("x_id"), col("y_id"), col("cosine"),
        (col("cosine") / (col("__degx") + col("__degy"))).as("margin"))
  }

  /** Corpus × corpus mining at scale — the production shape: BOTH kNN
    * passes are [[Ann.knnJoin]] at constant cell size (cells ∝ corpus,
    * per-row candidate volume constant), so the whole x-language mines
    * against the whole y-language in linear work; the margin arithmetic
    * is the identical bounded per-row tail. Candidate recall is the IVF
    * dial's (q156/AnnIndexSpec); the scoring rule is [[marginScores]]'s,
    * exercised bit-for-bit by q187's exact oracle.
    */
  def minePairsIvf(
      xCorpus: DataFrame,
      yCorpus: DataFrame,
      xId: String,
      xVec: String,
      yId: String,
      yVec: String,
      k: Int = 4,
      numCentroids: Int = 256,
      nprobe: Int = 2,
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val nnXY = Ann.knnJoin(xCorpus.select(col(xId), col(xVec)), yCorpus,
      xId, xVec, yId, yVec, k, numCentroids, nprobe)
    val candY = nnXY.select(col("neighbor_id").as("__yq")).distinct()
      .join(yCorpus.select(col(yId).as("__yq"), col(yVec).as("__yv")), Seq("__yq"))
    val nnYX = Ann.knnJoin(candY, xCorpus, "__yq", "__yv", xId, xVec,
      k, numCentroids, nprobe)
    pickBest(marginFromNN(nnXY, nnYX, k))
  }

  private def pickBest(scores: DataFrame): DataFrame =
    scores
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("x_id"))
          .orderBy(col("margin").desc, col("y_id").asc)))
      .where(col("__rn") === 1)
      .select(col("x_id"), col("y_id"), col("cosine"), col("margin"))

  /** The mined pair table: argmax-margin candidate per source row, ties
    * broken by (margin DESC, y_id ASC). Filter on `margin` downstream
    * (the paper's acceptance threshold is a dial, typically ~1.05–1.2) —
    * or use [[minePairsBidirectional]], which applies the threshold and
    * the paper's direction-combination strategies for you.
    */
  def minePairs(
      xQueries: DataFrame,
      yCorpus: DataFrame,
      xCorpus: DataFrame,
      xId: String,
      xVec: String,
      yId: String,
      yVec: String,
      k: Int = 4,
  ): DataFrame =
    pickBest(marginScores(xQueries, yCorpus, xCorpus, xId, xVec, yId, yVec, k))

  /** The paper's ACCEPTANCE semantics (Artetxe & Schwenk 2019 §3.2) on top
    * of [[minePairs]]: mine in BOTH directions (per-x best y, per-y best
    * x), combine by `strategy`, and keep pairs whose margin clears
    * `marginThreshold` (the paper's dial, typically ~1.05–1.2; 0.0 keeps
    * everything).
    *
    *  - `"forward"`      — per-source picks only
    *  - `"backward"`     — per-target picks only (reoriented to (x, y))
    *  - `"intersection"` — pairs BOTH directions picked: highest
    *                       precision, the paper's default for noisy
    *                       corpora
    *  - `"union"`        — pairs EITHER direction picked: highest recall
    *
    * A pair found by both directions carries two margins (the two
    * directions' normalizer pairs are identical — cos(x,y), deg(x),
    * deg(y) — but each direction's candidate pool bounds which pairs
    * SURVIVED to be scored); the combined row keeps the MAX margin (and
    * max cosine — equal up to float association either way), so union
    * ranks a doubly-confirmed pair at its strongest evidence and the
    * threshold cut is monotone in strategy: intersection ⊆ either
    * direction ⊆ union at any threshold.
    *
    * Scale shape: two [[minePairs]] passes (each the bounded-batch exact
    * dial — swap in [[minePairsIvf]] candidates for corpus × corpus
    * mining); the combine is a join/union on the (x, y) pair key — one
    * shuffle over rows already reduced to ≤|X| + |Y| picks.
    */
  def minePairsBidirectional(
      xCorpus: DataFrame,
      yCorpus: DataFrame,
      xId: String,
      xVec: String,
      yId: String,
      yVec: String,
      k: Int = 4,
      strategy: String = "intersection",
      marginThreshold: Double = 0.0,
  ): DataFrame = {
    // SHARED kNN passes (round 17, guide §2.4 — don't compute it twice):
    // the two directions previously ran FOUR kNN passes (x→Y, candY→X,
    // y→X, candX→Y). A row's neighborhood — and hence its degree fold —
    // depends only on the row and the opposite corpus, never on which
    // queries ride along, so the full x→Y and y→X tables carry BOTH
    // directions: forward picks/degrees read (nnXY, nnYX), backward reads
    // them swapped, and the candidate-restricted passes were exactly
    // row-subsets of these (bit-identical margins; the q192 oracle pins it).
    val nnXY = Ann.bruteForceTopK(yCorpus, xCorpus, yId, yVec, xId, xVec, k)
    val nnYX = Ann.bruteForceTopK(xCorpus, yCorpus, xId, xVec, yId, yVec, k)
    val fwd  = pickBest(marginFromNN(nnXY, nnYX, k))
    val bwd  = pickBest(marginFromNN(nnYX, nnXY, k))
    combineDirections(fwd, bwd, strategy, marginThreshold)
  }

  /** [[minePairsBidirectional]] at the production dial: both directions'
    * picks come from [[minePairsIvf]] (constant-cell candidates, linear
    * corpus × corpus work), the combine/threshold semantics are identical.
    * The forward direction's quality is hash-gated by q188; the combine
    * arithmetic is q192's oracle-proven chain.
    */
  def minePairsIvfBidirectional(
      xCorpus: DataFrame,
      yCorpus: DataFrame,
      xId: String,
      xVec: String,
      yId: String,
      yVec: String,
      k: Int = 4,
      numCentroids: Int = 256,
      nprobe: Int = 2,
      strategy: String = "intersection",
      marginThreshold: Double = 0.0,
  ): DataFrame = {
    // same shared-pass shape as [[minePairsBidirectional]] (round 17): two
    // full knnJoin passes instead of four (the candidate-restricted passes
    // were row-subsets — knnJoin's per-query candidates depend only on the
    // query row and the opposite corpus)
    val nnXY = Ann.knnJoin(xCorpus.select(col(xId), col(xVec)), yCorpus,
      xId, xVec, yId, yVec, k, numCentroids, nprobe)
    val nnYX = Ann.knnJoin(yCorpus.select(col(yId), col(yVec)), xCorpus,
      yId, yVec, xId, xVec, k, numCentroids, nprobe)
    val fwd = pickBest(marginFromNN(nnXY, nnYX, k))
    val bwd = pickBest(marginFromNN(nnYX, nnXY, k))
    combineDirections(fwd, bwd, strategy, marginThreshold)
  }

  /** Combine forward picks with backward picks (still in the backward
    * (x=target, y=source) orientation — reoriented here), then cut at the
    * margin threshold. A pair both directions found carries bit-identical
    * margins (same cos, same two normalizer folds; IEEE mult commutes),
    * so max/greatest is exact, and intersection ⊆ direction ⊆ union at
    * any threshold.
    */
  private def combineDirections(
      fwd: DataFrame,
      bwdRaw: DataFrame,
      strategy: String,
      marginThreshold: Double,
  ): DataFrame = {
    val bwd = bwdRaw.select(col("y_id").as("x_id"), col("x_id").as("y_id"),
      col("cosine"), col("margin"))
    val combined = strategy match {
      case "forward"  => fwd
      case "backward" => bwd
      case "intersection" =>
        fwd.as("f").join(bwd.as("b"), Seq("x_id", "y_id"))
          .select(col("x_id"), col("y_id"),
            greatest(col("f.cosine"), col("b.cosine")).as("cosine"),
            greatest(col("f.margin"), col("b.margin")).as("margin"))
      case "union" =>
        fwd.unionByName(bwd)
          .groupBy(col("x_id"), col("y_id"))
          .agg(max(col("cosine")).as("cosine"), max(col("margin")).as("margin"))
      case other => throw new IllegalArgumentException(
        s"unknown strategy '$other' (expected forward|backward|intersection|union)")
    }
    combined.where(col("margin") >= lit(marginThreshold))
  }
}
