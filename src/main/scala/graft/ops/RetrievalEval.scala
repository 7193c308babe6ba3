package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: nDCG@k of a ranked result table against a
  * graded relevance table (Järvelin & Kekäläinen, TOIS 2002) — the metric
  * that closes the loop on the retrieval family (BM25 q165, kNN q18/q19,
  * RRF q173): a curation pipeline that builds indexes needs a measurable
  * answer to "did retrieval get better or worse" per corpus snapshot.
  *
  * Determinism contract (cross-engine parity): the rank discounts
  * 1/log2(i+1) and their prefix sums are COMPILE-TIME CONSTANTS (computed
  * once in Scala, interpolated into the oracle bit-for-bit), so no runtime
  * log parity is needed; DCG folds rel·w[rank] in ascending-rank order
  * (one fold chain per query over ≤k rows); IDCG is computed from
  * per-grade COUNTS (exact BIGINTs) — the ideal list of a graded qrel set
  * is "all grade-g docs before any grade-(g−1) docs", so its DCG is a
  * prefix-sum expression over the counts, no sort over judged docs at all.
  *
  * Scale shape: `ranked` is |queries|·k rows (bounded). `qrels` may be
  * large (judged corpus); it is touched by ONE hash aggregate
  * (query × grade counts — G·|queries| rows out, G = distinct grades) and
  * one broadcast-friendly join against the ranked rows. Nothing sorts the
  * judged set; nothing is corpus × corpus.
  */
object RetrievalEval {

  /** The rank discounts 1/log2(i+1), i = 1..k — public so the oracle can
    * interpolate the SAME doubles instead of re-deriving logs at runtime.
    */
  def discounts(k: Int): Seq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** Prefix sums of [[discounts]]: prefixW(j) = Σ_{i<=j} w_i, prefixW(0)=0. */
  def discountPrefix(k: Int): Seq[Double] = discounts(k).scanLeft(0.0)(_ + _)

  /** Per-query (n_judged, dcg_at_k, idcg_at_k, ndcg_at_k).
    *
    * @param ranked (queryCol, rankCol, docCol) rows, rank 1-based; rows
    *               with rank > k are ignored
    * @param qrels  (queryCol, docCol, relCol) graded relevance, rel >= 0
    *               integers; unjudged (query, doc) pairs count as rel 0
    */
  def ndcgAtK(
      ranked: DataFrame,
      qrels: DataFrame,
      queryCol: String = "query_id",
      docCol: String = "doc_id",
      rankCol: String = "rank",
      relCol: String = "rel",
      k: Int = 10,
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val wLit = typedLit(discounts(k))
    val pLit = typedLit(discountPrefix(k))

    val q   = col(queryCol).as("query_id")
    val rel = coalesce(col(relCol).cast("long"), lit(0L))

    // DCG: ranked rows joined to their grades, folded in ascending-rank
    // order — array_sort on (rank, rel) structs makes the fold order
    // partition-independent
    val graded = ranked.where(col(rankCol) <= k)
      .select(q, col(rankCol).cast("int").as("__r"), col(docCol).as("__d"))
      .join(qrels.select(col(queryCol).as("query_id"), col(docCol).as("__d"),
        rel.as("__rel")), Seq("query_id", "__d"), "left")
      .select(col("query_id"), col("__r"), coalesce(col("__rel"), lit(0L)).as("__rel"))
    val dcg = graded
      .groupBy(col("query_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__r").as("r"), col("__rel").as("g")))),
        lit(0.0),
        (acc, x) => acc + x.getField("g").cast("double") * element_at(wLit, x.getField("r")))
        .as("dcg_at_k"))

    // IDCG from per-grade counts: the ideal ranking lists grade g's docs
    // before any lower grade, so its DCG is Σ_g g·(prefixW(used+take) −
    // prefixW(used)) — a fold over the ≤G distinct grades, descending
    def pAt(idx: Column): Column = element_at(pLit, (idx + 1).cast("int"))
    val idcg = qrels.where(rel > 0)
      .groupBy(col(queryCol).as("query_id"), rel.as("__g"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("query_id"))
      .agg(aggregate(
        reverse(array_sort(collect_list(struct(col("__g").as("g"), col("__n").as("n"))))),
        struct(lit(0L).as("used"), lit(0.0).as("idcg")),
        (acc, x) => {
          val used = acc.getField("used")
          val take = least(x.getField("n"), greatest(lit(k.toLong) - used, lit(0L)))
          struct(
            (used + take).as("used"),
            (acc.getField("idcg") +
              x.getField("g").cast("double") * (pAt(used + take) - pAt(used))).as("idcg"))
        },
        acc => acc.getField("idcg")).as("idcg_at_k"),
        sum(col("__n")).as("n_judged"))

    dcg.join(idcg, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_judged"), lit(0L)).as("n_judged"),
        round(col("dcg_at_k"), 6).as("dcg_at_k"),
        round(coalesce(col("idcg_at_k"), lit(0.0)), 6).as("idcg_at_k"),
        round(when(coalesce(col("idcg_at_k"), lit(0.0)) === 0.0, lit(0.0))
          .otherwise(col("dcg_at_k") / col("idcg_at_k")), 6).as("ndcg_at_k"))
  }
}
