package graft.similarity

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — the
  * beyond-reference similarity component (SURVEY.md §7 step 10).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast
  *    (BroadcastNestedLoopJoin) so the corpus streams once with NO shuffle of
  *    the corpus side; per-query top-k is a partial (map-side) aggregate.
  *    Right when |queries| is small — the common "find neighbors of these N
  *    probes" shape, even at 100 TB corpus.
  *  - [[lshTopK]]: SRP-LSH bucketed candidates (multi-table for recall), then
  *    exact cosine only within matching buckets — the large-query-set /
  *    corpus-vs-corpus scale path; never all-pairs.
  */
object Ann {

  /** Exact top-k neighbors per query vector.
    *
    * @param corpus  (idCol, vecCol) rows — arbitrarily large
    * @param queries (queryIdCol, vecCol) rows — SMALL (broadcast)
    *
    * Top-k uses min_by-style partial aggregation (`groupBy(queryId)` over
    * (sim, id) structs): each corpus partition emits at most k candidates per
    * query before the shuffle, so the wide stage moves |queries|·k rows, not
    * the corpus.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int = 10,
  ): DataFrame = {
    val scored = corpus
      .select(col(corpusId).as("__nid"), col(corpusVec).as("__nvec"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qvec"))))
      .select(
        col("query_id"),
        col("__nid"),
        cosine(col("__qvec"), col("__nvec")).as("__sim"),
      )
    // struct ordering = (sim, id) lexicographic; slice(sort_desc)[1..k] after a
    // partial-aggregating groupBy — deterministic id tie-break.
    scored
      .groupBy(col("query_id"))
      .agg(slice(sort_array(collect_list(struct(col("__sim"), col("__nid"))), asc = false), 1, k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        (col("pos") + 1).as("rank"),
        col("col.__nid").as("neighbor_id"),
        col("col.__sim").as("cosine"),
      )
  }

  /** Approximate top-k: candidates from `tables` independent SRP-LSH bucket
    * joins (recall grows with tables; `bits` trades bucket selectivity), then
    * exact cosine + top-k within candidates only.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int = 10,
      bits: Int = 10,
      tables: Int = 4,
  ): DataFrame = {
    def bucketize(df: DataFrame, id: String, vec: String, idOut: String): DataFrame =
      df.select(col(id).as(idOut), col(vec).as(s"${idOut}_vec"),
        posexplode(array((0 until tables).map(t => srpBucket(col(vec), bits, seed = 7L + t)): _*)))
        .toDF(idOut, s"${idOut}_vec", "tbl", "bucket")

    val c = bucketize(corpus, corpusId, corpusVec, "neighbor_id")
    val q = bucketize(queries, queryId, queryVec, "query_id")
    val candidates = c.join(q, Seq("tbl", "bucket"))
      .select(col("query_id"), col("neighbor_id"), col("query_id_vec"), col("neighbor_id_vec"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("query_id_vec"), col("neighbor_id_vec")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
